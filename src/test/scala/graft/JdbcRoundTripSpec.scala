package graft

import org.apache.spark.sql.functions._
import graft.io.JdbcIO

/** S1/S2/K5 executed against a REAL database: Spark ships Apache Derby,
  * so the JDBC write → scan → partitioned scan → pushdown-query → append
  * cycle runs end-to-end in-process — the closest available analogue of
  * the reference's embedded-DB path (reference: service_manager.py:
  * 121-171 dialect connections; series_service.py:746-752 bulk append).
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    // keep derby.log out of the repo working dir
    System.setProperty("derby.system.home", d.toString)
    d.toString
  }
  private val conn = JdbcIO.Conn(JdbcIO.Derby, "", s"$dbDir/rtdb")
  private val d = "/root/testdata/sf0.001"

  // 500-row sample of the fact table; ts kept out (Derby TIMESTAMP vs
  // TimestampNTZ round-trip is a separate concern from the scan/append
  // contract under test).
  private lazy val sample = Tables.events(spark, d)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    .filter(col("event_id") < 500)

  test("K5 append creates the table and a scan reads the rows back") {
    JdbcIO.append(sample, conn, "events_rt",
      // CLOB (the dialect's string default) can't be filtered/compared
      // in Derby; the reference schema uses bounded VARCHARs anyway
      Map("createTableColumnTypes" -> "event_type VARCHAR(32)"))
    val back = JdbcIO.read(spark, conn, "events_rt").load()
    assert(back.count() === sample.count())
    val (s1, s2) = (
      back.agg(sum(col("value"))).head.getDouble(0),
      sample.agg(sum(col("value"))).head.getDouble(0))
    assert(math.abs(s1 - s2) < 1e-6)
  }

  test("S2/S3 partitioned read fans the scan out over ranges") {
    val parts = JdbcIO.read(spark, conn, "events_rt",
      partitionOn = Some(("event_id", 0L, 500L, 4))).load()
    assert(parts.rdd.getNumPartitions === 4)
    assert(parts.count() === sample.count())
    // no row lost or duplicated across range boundaries
    assert(parts.select("event_id").distinct().count() === sample.count())
  }

  test("S2 pushdown-query scan executes remote SQL") {
    // Spark's JDBC writer quotes COLUMN identifiers (case-sensitive
    // lowercase) but not the table name (folds to uppercase in Derby) —
    // raw pushdown SQL must follow suit.
    val q = "(SELECT \"user_id\", COUNT(*) AS n FROM events_rt " +
      "GROUP BY \"user_id\") t"
    val agg = JdbcIO.read(spark, conn, q).load()
    val expected = sample.groupBy("user_id").count().count()
    assert(agg.count() === expected)
  }

  test("filters push into the JDBC source, not post-scan") {
    val df = JdbcIO.read(spark, conn, "events_rt").load()
      .filter(col("value") > 100.0 && col("event_type") === "purchase")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(value,100.0)") &&
      plan.contains("EqualTo(event_type,purchase)"), plan)
    val direct = sample
      .filter(col("value") > 100.0 && col("event_type") === "purchase")
    assert(df.count() === direct.count())
  }

  test("K5 append to an existing table accumulates (reference to_sql semantics)") {
    val before = JdbcIO.read(spark, conn, "events_rt").load().count()
    JdbcIO.append(sample.limit(50), conn, "events_rt")
    val after = JdbcIO.read(spark, conn, "events_rt").load().count()
    assert(after === before + 50)
  }

  test("M3 delete write-back removes exactly the addressed rows") {
    // own table — no order coupling with the events_rt tests
    JdbcIO.append(sample, conn, "events_m3",
      Map("createTableColumnTypes" -> "event_type VARCHAR(32)"))
    val total = sample.count()
    val clicks = sample.filter(col("event_type") === "click").count()
    // the reference's delete_values_by_series shape: one predicate,
    // executed by the database (series_service.py:903-926). The value
    // is BOUND, not interpolated; the column identifier is quoted as
    // the writer created it (unquoted names fold to uppercase in
    // Derby and miss).
    val n = JdbcIO.deleteWhere(conn, "events_m3",
      "\"event_type\" = ?", Seq("click"))
    assert(n.toLong === clicks)
    val back = JdbcIO.read(spark, conn, "events_m3").load()
    assert(back.count() === total - clicks)
    assert(back.filter(col("event_type") === "click").count() === 0L)
  }
}
