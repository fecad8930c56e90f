package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — the reference's signature long→wide reshape
  * (reference: pd.pivot_table at src/Utilities/DatasetUtilities.py:166-169)
  * re-expressed as `groupBy(index).pivot(col, values).agg(...)`.
  *
  * Scale notes (100 TB):
  *  - the pivot VALUE DOMAIN is always passed explicitly. Spark's
  *    `pivot(col)` without values runs an eager distinct job over the whole
  *    fact table just to learn the column list; with the domain supplied
  *    (it comes from a dim table — VariableCode in the reference — which is
  *    small and known up front) the pivot is a single shuffle-free
  *    map-side-combinable hash aggregation.
  *  - `avg` matches the reference's `pivot_table(aggfunc='mean')` default
  *    (SURVEY.md §2.5 semantic trap): duplicate (index, key) observations
  *    are averaged, deliberately bug-compatible.
  *  - the wide frame has one row per index key — cardinality shrinks by
  *    ~|domain|, so the pivot REDUCES data volume; it never explodes it.
  */
object PivotOps {

  /** V1 — long→wide pivot with explicit column domain. `cellAgg` is
    * REQUIRED (no default): the natural-looking `round(avg(v), 2)`
    * default was exactly the engine-round-over-raw-double-average trap
    * the determinism playbook forbids (partition-order-dependent sum +
    * engine-divergent rounding at .xx5), and every caller already
    * passes [[centsMean]] over a [[centsOf]] column — which is the
    * shape new callers should copy.
    */
  def pivotWide(df: DataFrame, index: Seq[Column], pivot: Column,
      domain: Seq[String], value: Column,
      cellAgg: Column => Column): DataFrame =
    df.groupBy(index: _*)
      .pivot(pivot, domain)
      .agg(cellAgg(value))

  /** Exact 2-decimal duplicate-mean over an integer-cents column,
    * deterministic across engines: the cents sum is exact in double
    * (< 2^53) regardless of partition order, and the rounding is plain
    * arithmetic (`floor(x+0.5)/100`) rather than an engine-specific
    * decimal-string round, so Spark and any SQL oracle produce
    * bit-identical cells. Use with `centsOf` on the value column.
    */
  def centsMean(cents: Column): Column =
    floor(avg(cents) + lit(0.5)) / lit(100.0)

  /** Scale a ≤2-decimal double column to exact integer cents. */
  def centsOf(value: Column): Column =
    round(value * 100).cast("long")

  /** V2 — per-column sentinel fill (reference: fillna(NoDataValue) per
    * variable, DatasetUtilities.py:171-175). NULL stays internal
    * (SURVEY.md §7.5 risk 2); the sentinel map is applied only at this
    * final presentation step.
    */
  def fillSentinels(wide: DataFrame, sentinels: Map[String, Double]): DataFrame =
    wide.na.fill(sentinels)

  /** V3 — duplicate-column disambiguation: the reference renames repeated
    * VariableCode columns `Temp → Temp-1, Temp-2` when the same code
    * appears under several MethodIDs (DatasetUtilities.py:295-335). Here
    * the pivot key is pre-composed `code-method` (deterministic,
    * MethodID-ascending — SURVEY.md §7.5 risk 5), which both flattens the
    * (code, method) MultiIndex (V4) and disambiguates in one step.
    */
  def composedPivotKey(code: Column, method: Column): Column =
    concat_ws("-", code, method)

  /** Inverse reshape (wide→long) via `stack`, dropping the NULL cells the
    * pivot introduced. Used to round-trip-test V1 and as the engine's
    * general unpivot.
    */
  def unpivot(wide: DataFrame, index: Seq[String], cols: Seq[String],
      keyName: String, valueName: String): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', `$c`").mkString(", ")
    wide.select(
      index.map(col) :+
        expr(s"stack(${cols.size}, $stackArgs) AS ($keyName, $valueName)"): _*)
      .filter(col(valueName).isNotNull)
  }
}
