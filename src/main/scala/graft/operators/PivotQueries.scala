package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PivotOps

/** SURVEY.md §2.5 pivot operators (V1-V4) over `events`: day plays the
  * reference's LocalDateTime index, event_type plays VariableCode,
  * user_id%2 plays MethodID, duplicate observations are averaged like
  * pandas pivot_table's aggfunc='mean' default.
  *
  * Cell determinism: the mean runs over exact integer cents and is
  * rounded arithmetically (PivotOps.centsMean), so Spark and the DuckDB
  * oracle produce bit-identical cells — engine round() implementations
  * disagree exactly at the .xx5 boundaries that duplicate-averaging of
  * 2-decimal data constantly produces.
  */
object PivotQueries {
  import Tables._

  /** Known pivot domain — comes from a dim in the reference; passing it
    * explicitly avoids Spark's eager distinct job (see PivotOps).
    */
  private val Types = Seq("click", "error", "purchase", "signup", "view")

  private def day = date_format(col("ts"), "yyyy-MM-dd").as("day")

  private def withCents(df: DataFrame): DataFrame =
    df.withColumn("cents", PivotOps.centsOf(col("value")))

  /** Per-"variable" NoDataValue sentinels (reference: Variable.NoDataValue,
    * odmdata/variable.py:23).
    */
  private val Sentinels = Map(
    "click" -> -999.0, "error" -> -888.0, "purchase" -> -777.0,
    "signup" -> -666.0, "view" -> -555.0)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1: long→wide pivot, duplicates averaged
    // (reference: DatasetUtilities.py:166-169).
    "v1_pivot_wide" -> ((s, d) =>
      PivotOps.pivotWide(withCents(events(s, d)), Seq(day),
        col("event_type"), Types, col("cents"), PivotOps.centsMean)),

    // V2: pivot + per-column sentinel fill
    // (reference: DatasetUtilities.py:171-175).
    "v2_pivot_sentinel" -> ((s, d) =>
      PivotOps.fillSentinels(
        PivotOps.pivotWide(withCents(events(s, d)), Seq(day),
          col("event_type"), Types, col("cents"), PivotOps.centsMean),
        Sentinels)),

    // V3+V4: composed `code-method` pivot key — duplicate-column
    // disambiguation + MultiIndex flattening in one deterministic step
    // (reference: DatasetUtilities.py:295-341).
    "v3_pivot_dupcols" -> ((s, d) =>
      PivotOps.pivotWide(withCents(events(s, d)), Seq(day),
        PivotOps.composedPivotKey(col("event_type"), col("user_id") % 2),
        for (t <- Types; m <- Seq(0, 1)) yield s"$t-$m",
        col("cents"), PivotOps.centsMean)),

    // Inverse reshape: V1 result unpivoted back to long form.
    "v4_unpivot" -> ((s, d) =>
      PivotOps.unpivot(
        PivotOps.pivotWide(withCents(events(s, d)), Seq(day),
          col("event_type"), Types, col("cents"), PivotOps.centsMean),
        Seq("day"), Types, "event_type", "avg_value"))
  )

  private val centsCte =
    "c AS (SELECT ts, event_type, user_id, " +
      "CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)"

  private def avgCase(t: String, m: Option[Int] = None): String = {
    val cond = m match {
      case Some(i) => s"event_type = '$t' AND user_id % 2 = $i"
      case None    => s"event_type = '$t'"
    }
    s"(floor(avg(CASE WHEN $cond THEN cents END) + 0.5) / 100.0)"
  }

  def oracle: Map[String, String] = Map(
    "v1_pivot_wide" ->
      s"""WITH $centsCte
          SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${Types.map(t => s"${avgCase(t)} AS \"$t\"").mkString(", ")}
          FROM c GROUP BY 1""",
    "v2_pivot_sentinel" ->
      s"""WITH $centsCte
          SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${Types.map(t =>
            s"COALESCE(${avgCase(t)}, ${Sentinels(t)}) AS \"$t\"")
            .mkString(", ")}
          FROM c GROUP BY 1""",
    "v3_pivot_dupcols" ->
      s"""WITH $centsCte
          SELECT strftime(ts, '%Y-%m-%d') AS day,
          ${(for (t <- Types; m <- Seq(0, 1))
             yield s"${avgCase(t, Some(m))} AS \"$t-$m\"").mkString(", ")}
          FROM c GROUP BY 1""",
    "v4_unpivot" ->
      s"""WITH $centsCte, wide AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
            ${Types.map(t => s"${avgCase(t)} AS \"$t\"").mkString(", ")}
            FROM c GROUP BY 1)
          ${Types.map(t =>
            s"""SELECT day, '$t' AS event_type, "$t" AS avg_value
                FROM wide WHERE "$t" IS NOT NULL""").mkString(" UNION ALL ")}"""
  )
}
