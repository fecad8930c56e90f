package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EditOps

/** SURVEY.md §2.6 window/ordered operators (W1-W7), driven through
  * [[graft.operators.EditOps]] over the `events` table: each user_id is a
  * "series", ordered by ts with event_id as the deterministic tiebreak.
  */
object WindowQueries {
  import Tables._

  private val K = Seq("user_id")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W10 (beyond reference): per-series z-score outlier detection —
    // the statistical companion of the edit engine's threshold filters.
    // Mean/variance come from EXACT integer-cent sums (playbook rule 2
    // generalized: sum and sum-of-squares of bounded ints are exact
    // under any partition order), and the z formula is written with the
    // same operation shape on both engines. Output: per-series count +
    // outlier count at |z| > 3.
    "w10_zscore_outliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val c = graft.operators.PivotOps.centsOf(col("value"))
      val stats = events(s, d)
        .withColumn("c", c)
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("c")).over(w))
        .withColumn("s2", sum(col("c") * col("c")).over(w))
      val m = col("s1").cast("double") / col("n") / lit(100.0)
      val msq = col("s2").cast("double") / col("n") / lit(10000.0)
      val varr = (msq - m * m) * col("n") / (col("n") - lit(1))
      // zero-variance guard: a constant series has varr == 0 (or a tiny
      // fp negative), making z NaN — and NaN sorts above every double in
      // both engines, so abs(z) > 3 would flag EVERY point of a flat
      // series as an outlier. Flat series must report 0 outliers.
      val z = when(varr > lit(0.0),
        (col("c").cast("double") / lit(100.0) - m) / sqrt(varr))
        .otherwise(lit(0.0))
      stats.filter(col("n") > 1)
        .withColumn("is_out", (abs(z) > 3.0).cast("int"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("is_out")).as("n_outliers"))
    }),

    // W11 (beyond reference): time-grid gap filling — materialize the
    // hourly grid each series should cover and count the missing
    // hours (the companion of W1's gap flags: W1 finds the gaps, this
    // quantifies them against the expected calendar). The grid is a
    // per-series sequence (generator path), never a driver loop.
    "w11_gap_fill" -> ((s, d) => {
      val hours = events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .distinct()
      val grid = hours.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      grid.join(hours, Seq("user_id", "h"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_missing"))
    }),

    // W1: data-gap detection (reference: edit_service.py:112-145)
    "w1_gap_flags" -> ((s, d) =>
      EditOps.withGapFlags(events(s, d), K, "ts", "event_id", 3600.0)
        .select("event_id", "user_id", "gap_flag")),

    // W2: value-change threshold (reference: edit_service.py:147-164)
    "w2_value_change" -> ((s, d) =>
      EditOps.withValueChangeFlags(events(s, d), K, "ts", "event_id",
        "value", 120.0)
        .select("event_id", "user_id", "change_flag")),

    // W3: consecutive-run grouping (reference: edit_service.py:341-360)
    "w3_run_groups" -> ((s, d) =>
      EditOps.withRunIds(events(s, d), K, "ts", "event_id",
        col("value") > 150.0)
        .filter(col("run_id").isNotNull)
        .select("event_id", "user_id", "run_id")),

    // W4: linear interpolation of "missing" points
    // (reference: edit_service.py:279-309); error events play the role
    // of the selected run to repair.
    "w4_interpolate" -> ((s, d) =>
      EditOps.interpolate(events(s, d), K, "ts", "event_id", "value",
        col("event_type") === "error", "value_interp")
        .select("event_id", "user_id", "value_interp")),

    // W5: drift correction over a selected window
    // (reference: edit_service.py:311-339)
    "w5_drift_correct" -> ((s, d) =>
      EditOps.driftCorrect(events(s, d), K, "ts", "value",
        col("ts").between(
          to_timestamp(lit("2024-01-10 00:00:00")),
          to_timestamp(lit("2024-01-20 00:00:00"))), 5.0, "value_corr")
        .select("event_id", "user_id", "value_corr")),

    // W6: season derivation + aggregation
    // (reference: calcSeason, series_service.py:597-609)
    "w6_season" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
          EditOps.season(col("l_shipdate")).cast("long").as("season"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(l_quantity * 100, 0) as bigint)"))
            / 100.0).as("sum_qty"))),

    // W7: month/year derivation (reference: series_service.py:619-620)
    "w7_month_year" -> ((s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(o_totalprice * 100, 0) as bigint)"))
            / 100.0).as("sum_price"))),

    // O1-analogue running aggregation: cumulative per-series sum —
    // ordered window frame (rowsBetween unboundedPreceding..current).
    "w8_running_sum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, d).select(col("event_id"), col("user_id"),
        (sum(expr("cast(round(value * 100, 0) as bigint)")).over(w)
          / 100.0).as("running_v"))
    })
  )

  def oracle: Map[String, String] = Map(
    "w1_gap_flags" ->
      """SELECT event_id, user_id,
         (COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 3600.0*1e6, FALSE)
          OR COALESCE(lead(epoch_us(ts)) OVER w - epoch_us(ts) >= 3600.0*1e6, FALSE))
           AS gap_flag
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "w2_value_change" ->
      """SELECT event_id, user_id,
         (COALESCE(abs(value - lag(value) OVER w) >= 120.0, FALSE)
          OR COALESCE(abs(lead(value) OVER w - value) >= 120.0, FALSE))
           AS change_flag
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    // same operation shapes as the Spark side: exact integer-cent sums,
    // then m/var/z in identical double expression order
    "w10_zscore_outliers" ->
      """WITH c AS (
           SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS c
           FROM events),
         st AS (
           SELECT user_id, count(*) AS n, sum(c) AS s1, sum(c * c) AS s2
           FROM c GROUP BY user_id),
         v AS (
           SELECT user_id, n, s1,
             (CAST(s2 AS DOUBLE) / n / 10000.0
               - (CAST(s1 AS DOUBLE) / n / 100.0)
                 * (CAST(s1 AS DOUBLE) / n / 100.0))
               * n / (n - 1) AS varr
           FROM st),
         z AS (
           SELECT c.user_id,
             CASE WHEN v.varr > 0 THEN
               (CAST(c.c AS DOUBLE) / 100.0
                 - CAST(v.s1 AS DOUBLE) / v.n / 100.0) / sqrt(v.varr)
             ELSE 0.0 END AS z
           FROM c JOIN v USING (user_id) WHERE v.n > 1)
         SELECT user_id, count(*) AS n,
           CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
         FROM z GROUP BY user_id""",
    // users with a complete hourly grid have no missing rows and are
    // absent from the output on both sides
    "w11_gap_fill" ->
      """WITH hrs AS (
           SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
           FROM events),
         bounds AS (
           SELECT user_id, min(h) AS h0, max(h) AS h1
           FROM hrs GROUP BY user_id),
         grid AS (
           SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM bounds)
         SELECT g.user_id, count(*) AS n_missing
         FROM grid g LEFT JOIN hrs
           ON hrs.user_id = g.user_id AND hrs.h = g.h
         WHERE hrs.h IS NULL
         GROUP BY g.user_id""",
    "w3_run_groups" ->
      """WITH sel AS (
           SELECT event_id, user_id, ts, (value > 150.0) AS sel FROM events),
         b AS (
           SELECT event_id, user_id, ts, sel,
             CASE WHEN COALESCE(lag(sel) OVER w <> sel, TRUE) THEN 1 ELSE 0 END
               AS bd
           FROM sel WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id, user_id,
           CAST(sum(bd) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
         FROM b WHERE sel""",
    "w4_interpolate" ->
      """WITH base AS (
           SELECT event_id, user_id, value,
             (event_type = 'error') AS miss,
             CAST(epoch_us(ts) AS DOUBLE) AS us,
             ts
           FROM events),
         n AS (
           -- anchor value AND timestamp gated on the SAME predicate
           -- (non-miss with a non-null value) so both come from one
           -- row — mirrors EditOps.interpolate's anchor contract
           SELECT event_id, user_id, value, miss, us,
             last_value(CASE WHEN NOT miss AND value IS NOT NULL
                 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN NOT miss AND value IS NOT NULL
                 THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(CASE WHEN NOT miss AND value IS NOT NULL
                 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN NOT miss AND value IS NOT NULL
                 THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
           FROM base)
         SELECT event_id, user_id,
           CASE WHEN miss AND pv IS NOT NULL AND nv IS NOT NULL
                     AND nt <> pt
                THEN pv + (us - pt) / (nt - pt) * (nv - pv)
                ELSE value END AS value_interp
         FROM n""",
    "w5_drift_correct" ->
      """WITH base AS (
           SELECT event_id, user_id, value,
             ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                    AND TIMESTAMP '2024-01-20 00:00:00' AS sel,
             CAST(epoch_us(ts) AS DOUBLE) AS us
           FROM events),
         ext AS (
           SELECT event_id, user_id, value, sel, us,
             min(CASE WHEN sel THEN us END) OVER (PARTITION BY user_id) AS x0,
             max(CASE WHEN sel THEN us END) OVER (PARTITION BY user_id) AS x1
           FROM base)
         SELECT event_id, user_id,
           CASE WHEN sel AND x1 > x0
                THEN value + 5.0 * ((us - x0) / (x1 - x0))
                ELSE value END AS value_corr
         FROM ext""",
    "w6_season" ->
      """SELECT year(l_shipdate) AS yr,
         CAST(floor((month(l_shipdate)-1)/3)+1 AS BIGINT) AS season,
         count(*) AS cnt,
         sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty
         FROM lineitem GROUP BY 1, 2""",
    "w7_month_year" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         count(*) AS cnt,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
           AS sum_price
         FROM orders GROUP BY 1, 2""",
    "w8_running_sum" ->
      """SELECT event_id, user_id,
         sum(CAST(round(value * 100, 0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) / 100.0 AS running_v
         FROM events"""
  )
}
