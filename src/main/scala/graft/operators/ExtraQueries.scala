package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coverage completions for SURVEY.md §2 rows not already exercised by
  * the core inventory: point selection by key set (P10), sentinel
  * pretty-printing (F6), global re-key with catalog recompute
  * (F12 + A5), exact percentiles, rollup aggregation, and the
  * approx-distinct scale path.
  */
object ExtraQueries {
  import Tables._

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P10: point selection by key set — join against a keys frame
    // (reference: select by id/datetime list, edit_service.py:169-184).
    // The key list is tiny and broadcast; at scale this is the
    // broadcast-semi-join idiom, never a giant isin literal.
    "p10_key_select" -> ((s, d) => {
      val keys = s.range(0, 50).select(
        (col("id") * 197 + 11).as("event_id"))
      events(s, d).join(broadcast(keys), Seq("event_id"), "left_semi")
        .select("event_id", "user_id", "value")
    }),

    // F6: sentinel pretty-print — integral floats render as integers
    // (reference: float.is_integer() formatting, DatasetUtilities.py:642).
    "f6_pretty_sentinel" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        when(col("value") === floor(col("value")),
          col("value").cast("long").cast("string"))
          .otherwise(col("value").cast("string")).as("value_str"))),

    // F12 + A5: global re-key of a series and catalog-row recompute
    // (reference: edit_service.py:375-391, 407-428 + :430-434).
    "f12_rekey_catalog" -> ((s, d) =>
      events(s, d)
        .withColumn("qc_level", lit(1L))
        .groupBy(col("user_id"), col("qc_level"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("begin_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
          count(lit(1)).as("n"))),

    // Exact interpolated percentiles (engine feature beyond the
    // reference; DuckDB quantile_cont is the same linear-interpolation
    // definition).
    "a8_percentiles" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99_price"))),

    // Rollup: hierarchical subtotals (engine completeness; maps to the
    // same shuffle as a grouping-sets expansion).
    "a9_rollup" -> ((s, d) =>
      orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))),

    // HLL approx-distinct — the 100 TB path for A1/A2-style distincts
    // (single pass, fixed memory, no exact-distinct shuffle). Sketch
    // internals differ per engine, so this is a rows-only gate; the
    // exact variants (a1/a2) remain the correctness anchors.
    "a10_approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey")).as("nd_part"),
        approx_count_distinct(col("l_suppkey")).as("nd_supp")))
  )

  def oracle: Map[String, String] = Map(
    "p10_key_select" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_id IN
           (SELECT x * 197 + 11 FROM range(0, 50) t(x))""",
    "f6_pretty_sentinel" ->
      """SELECT event_id,
         CASE WHEN value = floor(value)
              THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
              ELSE CAST(value AS VARCHAR) END AS value_str
         FROM events""",
    "f12_rekey_catalog" ->
      """SELECT user_id, 1::BIGINT AS qc_level,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS begin_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
         count(*) AS n
         FROM events GROUP BY user_id""",
    "a8_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         round(quantile_cont(l_quantity, 0.9), 4) AS p90,
         round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
         FROM lineitem GROUP BY l_returnflag""",
    "a9_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
         round(sum(o_totalprice), 2) AS sum_price
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""
    // a10_approx_distinct: rows-only (sketches are engine-specific)
  )
}
