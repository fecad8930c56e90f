package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, expressed
  * Spark-first (DataFrame API, broadcast dims, windows) over the driver's
  * TPC-H-ish testdata. [[oracleSql]] holds the DuckDB-equivalent ANSI SQL
  * for the correctness gate. Column names/aliases match exactly between
  * both sides; floating aggregates are rounded identically on both sides
  * so the value-hash compare is stable.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ WindowQueries.all ++ PivotQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      StreamingQueries.all ++ MultimodalQueries.all ++ ExtraQueries.all ++
      CvQueries.all

  def oracleSql: Map[String, String] =
    coreOracle ++ WindowQueries.oracle ++ PivotQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++ SimilarityQueries.oracle ++
      StreamingQueries.oracle ++ MultimodalQueries.oracle ++
      ExtraQueries.oracle ++ CvQueries.oracle

  // ---------------------------------------------------------------------
  // Core relational inventory: scans (S), projections/filters (P),
  // joins (J), aggregations (A), sorts (O), set ops, scalar funcs (F).
  // Reference semantics cited per query; see SURVEY.md §2.
  // ---------------------------------------------------------------------

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-group + flagship: grouped aggregation with map-side partial agg
    // (reference: per-series stats, series_service.py:430-434 analogue).
    // Exact-cents sums (w9/a9/x12 convention): round(sum(double), n)
    // is partition-order-dependent within ulps of rounding boundaries;
    // per-row cents are exact BIGINTs, so the sums — and the division
    // by 100.0 — are bit-identical across engines and partitionings.
    // The avg uses the floor(x+0.5) idiom (t7's): pure IEEE ops, which
    // both engines compute bit-identically, where round() differs
    // (Spark rounds the shortest decimal repr, DuckDB the raw binary).
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(expr("cast(round(l_quantity * 100, 0) as bigint)"))
            / 100.0).as("sum_qty"),
          (sum(expr("cast(round(l_extendedprice * 100, 0) as bigint)"))
            / 100.0).as("sum_base_price"),
          (sum(expr(
            "cast(round(l_extendedprice * (1 - l_discount) * 100, 0) as bigint)"))
            / 100.0).as("sum_disc_price"),
          (floor(sum(expr("cast(round(l_quantity * 100, 0) as bigint)"))
            * 100.0 / count(lit(1)) + 0.5) / 10000.0).as("avg_qty"),
          count(lit(1)).as("cnt"))),

    // P1+P7: column projection + NOT NULL predicate
    // (reference: series_service.py:390-398, :210).
    "p1_project" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag").isNotNull && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    // P2: equality filter on a dim (reference: series_service.py:64-84).
    "p2_eq_filter" -> ((s, d) =>
      customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")),

    // P3: composite multi-predicate conjunction — the 5-key series filter
    // (reference: get_values_by_series, series_service.py:515-537).
    "p3_composite_filter" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
          col("l_quantity").between(10, 20) && col("l_discount") > 0.02 &&
          col("l_tax") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")),

    // P4: IN-list predicate (reference: series_service.py:401-430).
    "p4_in_list" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")),

    // P5/F2: BETWEEN year-window on timestamps
    // (reference: series_service.py:327-331, 407-413).
    "p5_between_year" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate").between(
          to_timestamp(lit("1996-01-01 00:00:00")),
          to_timestamp(lit("1996-12-31 23:59:59"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))),

    // P6: open range predicate — incremental resume
    // (reference: series_service.py:415-430).
    "p6_open_range" -> ((s, d) =>
      events(s, d)
        .filter(col("ts") > to_timestamp(lit("2024-01-25 00:00:00")))
        .select("event_id", "user_id", "event_type")),

    // P8/P9 threshold + date filter with selection refinement (chained
    // filters; reference: edit_service.py:66-109).
    "p8_threshold_refine" -> ((s, d) =>
      events(s, d)
        .filter(col("value") > 150.0)
        .filter(col("ts") < to_timestamp(lit("2024-01-10 00:00:00")))
        .select("event_id", "user_id", "value")),

    // P11: selection composition as a boolean column
    // (reference: _filter_from_selection, edit_service.py:58-60).
    "p11_selection_flag" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        (col("value") > 100.0 &&
          col("event_type") === "purchase").as("selected"))),

    // P12: sentinel exclusion + date range
    // (reference: series_service.py:642-647).
    "p12_sentinel_exclude" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_discount") =!= 0.0 &&
          col("l_shipdate").between(
            to_timestamp(lit("1997-01-01 00:00:00")),
            to_timestamp(lit("1998-12-31 23:59:59"))))
        .select("l_orderkey", "l_linenumber", "l_discount")),

    // J1: fact↔dim equi-join. No explicit broadcast hint: `part` grows
    // with SF (unbounded at 100 TB), so the join strategy is left to
    // AQE + autoBroadcastJoinThreshold — broadcast when it fits, shuffle
    // hash/sort-merge when it doesn't.
    // (reference: series_service.py:355-359).
    "j1_dim_join" -> ((s, d) =>
      lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg((sum(expr("cast(round(l_extendedprice * 100, 0) as bigint)"))
            / 100.0).as("revenue"),
          count(lit(1)).as("cnt"))),

    // J2: composite-key (multi-column) equi-join — the 5-col series
    // relationship analogue (reference: odmdata/series.py:83-91).
    "j2_composite_join" -> ((s, d) => {
      val e = events(s, d)
      // keys is small after the selective filter+distinct, but its size is
      // data-dependent — let AQE pick broadcast vs shuffle at runtime.
      val keys = e.filter(col("value") > 195.0)
        .select("user_id", "event_type").distinct()
      e.join(keys, Seq("user_id", "event_type"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(value * 100, 0) as bigint)"))
            / 100.0).as("sum_v"))
    }),

    // J3-J5: left-semi join (distinct-ids-used-by subquery pattern,
    // reference: series_service.py:202-231, 268-287).
    "j3_semi_join" -> ((s, d) =>
      supplier(s, d)
        .join(lineitem(s, d).select(col("l_suppkey").as("s_suppkey")),
          Seq("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")),

    // J6: left outer join attaching dim attributes. `customer` scales
    // with SF — no broadcast hint; AQE decides (at 100 TB this is a
    // shuffle join, ideally co-bucketed on custkey).
    // (reference: DatasetUtilities.py:183-189).
    "j6_left_join" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d),
          col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "c_name", "o_totalprice")),

    // J7/A7/M5: anti join — existence check / conflict detection
    // (reference: series_service.py:948-1028).
    "j7_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // J-chain: multi-hop dim joins (ORM navigation analogue, J7 in §2.3).
    "j2_multihop" -> ((s, d) =>
      supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")),

    // A1: DISTINCT projection (reference: series_service.py:51, 94).
    "a1_distinct" -> ((s, d) =>
      customer(s, d).select("c_mktsegment").distinct()),

    // A2: DISTINCT with predicate (reference: series_service.py:208-231).
    "a2_distinct_pred" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") > 48)
        .select("l_suppkey").distinct()),

    // A3: COUNT (reference: memory_database.py:42-45).
    "a3_count" -> ((s, d) =>
      lineitem(s, d).agg(count(lit(1)).as("n"))),

    // A4: global MIN/MAX → year range (reference: GetSeriesYearRange,
    // DatasetUtilities.py:409-417).
    "a4_minmax_year" -> ((s, d) =>
      lineitem(s, d).agg(
        year(min(col("l_shipdate"))).cast("long").as("y0"),
        year(max(col("l_shipdate"))).cast("long").as("y1"))),

    // A5: per-series catalog stats (begin/end/count)
    // (reference: edit_service.py:430-434; SeriesCatalog materialization).
    "a5_series_stats" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("begin_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
          count(lit(1)).as("n"))),

    // A6: collect-set of codes, deterministically ordered
    // (reference: DatasetUtilities.py:200-201).
    "a6_collect_set" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
          .as("priorities"))),

    // A7: existence flag per key (reference: series_service.py:948-983).
    "a7_exists_flag" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey").as("c_custkey"))
          .distinct().withColumn("has_order", lit(true)),
          Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("has_order"), lit(false)).as("has_order"))),

    // O1/O2/O3: multi-key sort + deterministic top-k limit
    // (reference: DatasetUtilities.py:293; .first() everywhere).
    "o2_topk" -> ((s, d) =>
      lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    // Set op: UNION ALL of two selections (reference §2.8: chunk concat,
    // series_service.py:436-441).
    "set_union" -> ((s, d) => {
      val li = lineitem(s, d)
      li.filter(col("l_quantity") < 2)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .unionAll(li.filter(col("l_quantity") > 49)
          .select("l_orderkey", "l_linenumber", "l_quantity"))
    }),

    // Set op: EXCEPT on keys (reference §2.8: selected/available split).
    "set_except" -> ((s, d) =>
      customer(s, d).select(col("c_custkey").as("k"))
        .except(orders(s, d).select(col("o_custkey").as("k")))),

    // Set op: INTERSECT on keys.
    "set_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_custkey").as("k"))
        .intersect(orders(s, d).select(col("o_custkey").as("k")))),

    // F3: surrogate composite id via concat (reference: odm_id,
    // series.py:99-102, H2OSeries.py:22-25).
    "f3_concat_key" -> ((s, d) =>
      lineitem(s, d)
        .select(concat_ws("_", col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_linenumber")).as("row_id"),
          col("l_quantity"))),

    // F8: stable content hash of the composite identity
    // (reference: H2OSeries.py:27-28).
    "f8_md5_key" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"))).as("digest"))),

    // F10/M4: conditional arithmetic update on selected rows
    // (reference: change_value, edit_service.py:233-256).
    "f10_cond_update" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          when(col("event_type") === "error", round(col("value") * 2.0, 2))
            .otherwise(col("value")).as("value_adj"))),

    // M1/M2: insert + delete as union/filter over an immutable frame
    // (reference: add_points/delete_points, edit_service.py:258-277).
    "m1_insert_delete" -> ((s, d) => {
      val e = events(s, d).select("event_id", "user_id", "value")
      val inserted = e.unionAll(
        e.filter(col("value") > 199.0)
          .select((col("event_id") + 1000000L).as("event_id"),
            col("user_id"), (col("value") + 1000.0).as("value")))
      inserted.filter(col("value") >= 1.0)
    })
  )

  private def coreOracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
           AS sum_base_price,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
             AS BIGINT)) / 100.0 AS sum_disc_price,
         floor(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
             * 100.0 / count(*) + 0.5) / 10000.0 AS avg_qty,
         count(*) AS cnt
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "p1_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_returnflag IS NOT NULL AND l_quantity > 45""",
    "p2_eq_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_mktsegment = 'BUILDING'""",
    "p3_composite_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_linestatus = 'F'
           AND l_quantity BETWEEN 10 AND 20
           AND l_discount > 0.02 AND l_tax < 0.05""",
    "p4_in_list" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')""",
    "p5_between_year" ->
      """SELECT l_orderkey, l_linenumber,
         strftime(l_shipdate, '%Y-%m-%d') AS ship_day
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
           AND TIMESTAMP '1996-12-31 23:59:59'""",
    "p6_open_range" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE ts > TIMESTAMP '2024-01-25 00:00:00'""",
    "p8_threshold_refine" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value > 150.0 AND ts < TIMESTAMP '2024-01-10 00:00:00'""",
    "p11_selection_flag" ->
      """SELECT event_id,
         (value > 100.0 AND event_type = 'purchase') AS selected
         FROM events""",
    "p12_sentinel_exclude" ->
      """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
         WHERE l_discount <> 0.0
           AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
             AND TIMESTAMP '1998-12-31 23:59:59'""",
    "j1_dim_join" ->
      """SELECT p_brand,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
           AS revenue,
         count(*) AS cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "j2_composite_join" ->
      """SELECT user_id, event_type, count(*) AS cnt,
         sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_v
         FROM events e JOIN
           (SELECT DISTINCT user_id, event_type FROM events
            WHERE value > 195.0) k
           USING (user_id, event_type)
         GROUP BY user_id, event_type""",
    "j3_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""",
    "j6_left_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "j7_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "j2_multihop" ->
      """SELECT s_suppkey, s_name, n_name, r_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey""",
    "a1_distinct" -> "SELECT DISTINCT c_mktsegment FROM customer",
    "a2_distinct_pred" ->
      "SELECT DISTINCT l_suppkey FROM lineitem WHERE l_quantity > 48",
    "a3_count" -> "SELECT count(*) AS n FROM lineitem",
    "a4_minmax_year" ->
      """SELECT year(min(l_shipdate)) AS y0, year(max(l_shipdate)) AS y1
         FROM lineitem""",
    "a5_series_stats" ->
      """SELECT user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS begin_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
         count(*) AS n
         FROM events GROUP BY user_id""",
    "a6_collect_set" ->
      """SELECT o_orderstatus,
         string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
           AS priorities
         FROM orders GROUP BY o_orderstatus""",
    "a7_exists_flag" ->
      """SELECT c_custkey,
         EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AS has_order
         FROM customer""",
    "o2_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 10""",
    "set_union" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity < 2
         UNION ALL
         SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 49""",
    "set_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT SELECT o_custkey AS k FROM orders""",
    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer
         INTERSECT SELECT o_custkey AS k FROM orders""",
    "f3_concat_key" ->
      """SELECT concat_ws('_', l_orderkey, l_partkey, l_suppkey,
         l_linenumber) AS row_id, l_quantity FROM lineitem""",
    "f8_md5_key" ->
      """SELECT o_orderkey,
         md5(concat_ws('|', o_orderkey, o_orderstatus, o_orderpriority))
           AS digest
         FROM orders""",
    "f10_cond_update" ->
      """SELECT event_id,
         CASE WHEN event_type = 'error' THEN round(value*2.0, 2)
              ELSE value END AS value_adj
         FROM events""",
    "m1_insert_delete" ->
      """WITH e AS (SELECT event_id, user_id, value FROM events),
         ins AS (SELECT * FROM e
                 UNION ALL
                 SELECT event_id + 1000000 AS event_id, user_id,
                        value + 1000.0 AS value
                 FROM e WHERE value > 199.0)
         SELECT * FROM ins WHERE value >= 1.0"""
  )
}
