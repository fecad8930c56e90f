package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-weighted source mixing — the data-mixing step that
  * rebalances a multi-source corpus before training (x7). Source s gets
  * a quota n_s = floor(T · w_s) with w_s ∝ c_s^0.5 (temperature 0.5
  * flattens the source distribution), and the quota is filled from a
  * deterministic stable-hash order — never rand(), so the mix is
  * reproducible across engines and partitionings.
  *
  * Two fill paths with the same selection semantics (a prefix of the
  * per-source hash order):
  *
  *  - [[exactMix]]: rank by hash within source (one per-source window),
  *    keep rank ≤ n_s. Exact quota; costs a per-source sort.
  *  - [[thresholdMix]]: keep docs whose hash is below
  *    t_s = (n_s / c_s) · 2⁶⁰ — NO sort, a codegen'd filter after a
  *    broadcast join. The quota is approximate (binomial concentration:
  *    n_s ± O(√n_s)), which is the right trade at extreme per-source
  *    cardinality where even a per-source window is a giant sort. The
  *    threshold is a deterministic function of the counts, so the
  *    selection is still exactly reproducible.
  */
object SourceMix {

  /** The stable mix order: 60-bit md5-derived hash of the doc id —
    * through the ONE salted-hash spelling ([[TextOps.hash15]]), so
    * the mix can never drift from the other bucketing sites on the
    * salt-prefix format.
    */
  def mixHash(idCol: Column): Column =
    TextOps.hash15(idCol.cast("string"), "mix")

  /** One row per source: (source, c, n_s). Integer-exact: the sqrt is
    * floored to BIGINT before the denominator sum (a double Σ√c would
    * be partition-order-dependent) and the quota is integer division,
    * capped at the source's own size.
    */
  def quotas(docs: DataFrame, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0,
      s"SourceMix.quotas: totalBudget >= 0 (got $totalBudget)")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("isq", floor(sqrt(col("c").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("isq")).as("tot"))
    // the budget×weight product runs in DECIMAL: two huge-but-legal
    // longs would silently WRAP a bigint product (non-ANSI) into a
    // negative quota; decimal(19,0)×decimal(19,0) stays exact to 38
    // digits, and integral `div` returns the same bigint quota on
    // every non-overflowing input
    counts.crossJoin(broadcast(tot))
      .withColumn("n_s", expr(
        s"least((CAST($totalBudget AS DECIMAL(19,0)) * " +
          "CAST(isq AS DECIMAL(19,0))) div tot, c)"))
      .select("source", "c", "n_s")
  }

  /** Working-name guard (PackOps' convention): the mix staging columns
    * must not collide with caller columns, or a caller column would be
    * silently overwritten / ambiguous at analysis.
    */
  private def guardNames(docs: DataFrame, names: String*): Unit =
    names.foreach(n => require(!docs.columns.contains(n),
      s"SourceMix: input already has a '$n' column — rename it first"))

  /** Exact-quota fill: the n_s smallest-hash docs per source.
    *
    * The quota attaches through a NULL-SAFE (<=>) join: quotas() counts
    * and budgets a NULL source like any other group, so an equality
    * join would silently drop every null-source doc AND under-fill the
    * total budget by that group's quota (the PackOps null-group
    * lesson).
    */
  def exactMix(docs: DataFrame, quota: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    guardNames(docs, "r", "__q_source", "n_s")
    val w = Window.partitionBy(col("source"))
      .orderBy(mixHash(col(idCol)), col(idCol))
    val q = broadcast(quota.select(col("source").as("__q_source"),
      col("n_s")))
    docs
      // NULL ids hash to NULL, which would sort FIRST here (filling
      // quotas preferentially) while thresholdMix's comparison drops
      // them — exclude them in BOTH paths so the two fills keep their
      // documented same-selection semantics
      .where(col(idCol).isNotNull)
      .withColumn("r", row_number().over(w).cast("long"))
      .join(q, col("source") <=> col("__q_source"))
      .filter(col("r") <= col("n_s"))
      .select(col("source"), col(idCol), col("r"))
  }

  /** Approximate-quota fill, no sort: keep docs with
    * hash < (n_s/c_s)·2⁶⁰, written as the EXACT integer comparison
    * hash·c_s < n_s·2⁶⁰ in decimal128 (19+14 digits, no precision
    * overflow; DuckDB replicates it in HUGEINT) — no double rounding
    * anywhere, so the selection is bit-reproducible and oracle-gated
    * (x9), not merely spec'd. The quota lands within n_s ± O(√n_s)
    * (binomial), which is the right trade at extreme per-source
    * cardinality where even a per-source window is a giant sort.
    */
  def thresholdMix(docs: DataFrame, quota: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    guardNames(docs, "c", "n_s", "__q_source")
    // a count past decimal(14,0) would cast to NULL (non-ANSI) and
    // the three-valued filter would silently drop the WHOLE source —
    // fail loudly instead (14 digits is what keeps the 19+14-digit
    // product exact inside decimal128; a bigger source must shard)
    val cChecked = when(col("c") >= lit(100000000000000L),
      raise_error(lit("thresholdMix: a source exceeds 1e14 docs — " +
        "the exact decimal comparison would overflow; shard the " +
        "source first")).cast("long"))
      .otherwise(col("c"))
    val lhs = mixHash(col(idCol)).cast("decimal(19,0)") *
      cChecked.cast("decimal(14,0)")
    val rhs = col("n_s").cast("decimal(14,0)") *
      lit(1152921504606846976L).cast("decimal(19,0)") // 2^60
    // null-safe quota join — see exactMix
    val q = broadcast(quota.select(col("source").as("__q_source"),
      col("c"), col("n_s")))
    docs
      .join(q, col("source") <=> col("__q_source"))
      .filter(lhs < rhs)
      .select(col("source"), col(idCol))
  }
}
