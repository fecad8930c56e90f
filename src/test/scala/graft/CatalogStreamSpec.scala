package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.catalog.SeriesCatalog
import graft.schema.Odm
import graft.streaming.StreamingOps

class CatalogStreamSpec extends SparkSpec {
  import spark.implicits._

  test("series catalog: per-series stats + broadcast dim attributes") {
    import java.time.LocalDateTime
    def t(h: Int) = LocalDateTime.of(2024, 1, 1, h, 0)
    val dv = Seq(
      Odm.DataValue(1, 1.0, None, t(0), -7.0, t(7), 10, 1, None, None,
        "nc", None, 5, 30, None, None, 1),
      Odm.DataValue(2, 2.0, None, t(3), -7.0, t(10), 10, 1, None, None,
        "nc", None, 5, 30, None, None, 1),
      Odm.DataValue(3, 9.0, None, t(1), -7.0, t(8), 20, 2, None, None,
        "nc", None, 5, 30, None, None, 1)
    ).toDS().toDF()
    val sites = Seq(Odm.Site(10, "A", "Site A", 0, 0, None, None, None),
      Odm.Site(20, "B", "Site B", 0, 0, None, None, None)).toDS().toDF()
    val vars = Seq(
      Odm.Variable(1, "Temp", "Temperature", 1, "w", 1, "c", "wq", -9999),
      Odm.Variable(2, "pH", "pH", 1, "w", 1, "c", "wq", -9999)).toDS().toDF()
    val methods = Seq(Odm.Method(5, "sensor")).toDS().toDF()
    val sources = Seq(Odm.Source(30, "org", "d", "c", "cit")).toDS().toDF()
    val qcs = Seq(Odm.QualityControlLevel(1, "1", "QC1")).toDS().toDF()

    val cat = SeriesCatalog.build(dv, sites, vars, methods, sources, qcs)
      .orderBy("odm_id")
    val rows = cat.select("odm_id", "ValueCount", "SiteCode",
        "VariableCode").as[(String, Long, String, String)].collect().toSeq
    assert(rows === Seq(
      ("10_1_5_30_1", 2L, "A", "Temp"),
      ("20_2_5_30_1", 1L, "B", "pH")))
    val span = cat.filter(col("odm_id") === "10_1_5_30_1")
      .select(date_format(col("BeginDateTime"), "HH:mm").as("b"),
        date_format(col("EndDateTime"), "HH:mm").as("e"))
      .as[(String, String)].head()
    assert(span === ("00:00", "03:00"))
  }

  test("streaming append to a file sink with checkpointed resume") {
    val out = Files.createTempDirectory("stream-sink").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val q = StreamingOps
      .eventsStream(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(out)
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    assert(written.count() === expected && expected > 0)

    // second AvailableNow run against the same checkpoint: no new input,
    // no duplicate output — the resume contract
    val q2 = StreamingOps
      .eventsStream(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() === expected)
  }
}
