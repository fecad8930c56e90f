package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import graft.pipeline.Publish
import graft.schema.Odm

/** End-to-end §3.1 reproduction on synthetic ODM-shaped tables
  * (FIXTURES.md §A): fact + dims → chunk by (SiteID, SourceID, QC) →
  * pivot VariableCode-MethodID wide → per-variable sentinel fill →
  * '#'-headed CSV named per the reference's filename rule.
  */
class OdmPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def t(h: Int) = LocalDateTime.of(2024, 1, 1, h, 0, 0)

  private val variables = Seq(
    Odm.Variable(1, "Temp", "Temperature", 1, "Surface water", 100,
      "Continuous", "Water Quality", -9999.0),
    Odm.Variable(2, "pH", "pH", 2, "Surface water", 100,
      "Continuous", "Water Quality", -8888.0))

  private val sites = Seq(
    Odm.Site(10, "LR_A", "Logan River A", 41.7, -111.8, Some(1400.0),
      Some("UT"), Some("Cache")),
    Odm.Site(20, "LR_B", "Logan River B", 41.6, -111.9, None, None, None))

  private def dv(id: Int, site: Int, variable: Int, hour: Int,
      v: Double): Odm.DataValue =
    Odm.DataValue(id, v, None, t(hour), -7.0, t(hour).plusHours(7),
      site, variable, None, None, "nc", None, 5, 30, None, None, 1)

  private val facts = Seq(
    dv(1, 10, 1, 0, 4.5), dv(2, 10, 2, 0, 7.1),
    dv(3, 10, 1, 1, 5.0), // hour 1: pH missing → sentinel -8888
    dv(4, 20, 1, 0, 3.2), dv(5, 20, 2, 0, 7.3))

  test("odm publish: chunked by site, pivoted by variable, sentinel-filled") {
    val fact = facts.toDS().toDF()
      .withColumn("VariableCode",
        when(col("VariableID") === 1, "Temp-5").otherwise("pH-5"))
    val spec = Publish.ChunkSpec(
      chunkKeys = Seq("SiteID", "SourceID", "QualityControlLevelID"),
      indexCol = "LocalDateTime", pivotKey = "VariableCode",
      valueCol = "DataValue", domain = Seq("Temp-5", "pH-5"),
      sentinels = Map("Temp-5" -> -9999.0, "pH-5" -> -8888.0))

    val dir = Files.createTempDirectory("odm-pub").toString
    val siteByID = sites.map(s => s.SiteID -> s).toMap
    val written = Publish.publishChunks(spark, fact, spec, dir, cv => {
      val site = siteByID(cv.head.asInstanceOf[Int])
      Seq(s"Site: ${site.SiteCode} (${site.SiteName})",
        s"Source: 30  QC: 1")
    })
    assert(written.size === 2) // one file per (site, source, qc)

    val f10 = Files.readAllLines(Paths.get(s"$dir/10_30_1.csv"))
    assert(f10.get(0) === "# Site: LR_A (Logan River A)")
    assert(f10.get(2) === "LocalDateTime,Temp-5,pH-5")
    assert(f10.get(3).endsWith(",4.5,7.1"))
    assert(f10.get(4).endsWith(",5.0,-8888.0")) // per-variable sentinel
  }

  test("full user story: QC edit with provenance, publish, upload") {
    import graft.operators.{RecordLog, RecordedSession}
    import graft.io.LocalDirUploader
    // 1. QC session on the fact table: select the bad Temp point by
    //    value and flag+fix it; every step is recorded provenance.
    val shape = RecordLog.Shape(Seq("SiteID", "VariableID"),
      "LocalDateTime", "ValueID", "DataValue", "qc_sel")
    val base = facts.toDS().toDF()
    val sess = Seq[RecordLog.EditAction](
      RecordLog.FilterValue("<", 4.0, intersect = false),
      RecordLog.FlagSelected("QualifierID", 7L),
      RecordLog.ChangeValue("+", 0.5)
    ).foldLeft(RecordedSession.open(base, shape))(_(_))
    // provenance round-trips and reproduces the edit
    val (sh2, acts2) = RecordLog.parse(sess.script)
    assert(RecordLog.replay(base, sh2, acts2)
      .select("ValueID", "DataValue", "QualifierID")
      .orderBy("ValueID").collect().toSeq ===
      sess.df.select("ValueID", "DataValue", "QualifierID")
        .orderBy("ValueID").collect().toSeq)
    // the 3.2 reading was flagged and corrected to 3.7
    val edited = sess.df
    assert(edited.filter(col("ValueID") === 4)
      .select("DataValue", "QualifierID").as[(Double, Option[Long])]
      .head() === ((3.7, Some(7L))))

    // 2. publish the edited frame and upload with delete-then-add
    val fact = edited
      .withColumn("VariableCode",
        when(col("VariableID") === 1, "Temp-5").otherwise("pH-5"))
    val spec = Publish.ChunkSpec(
      chunkKeys = Seq("SiteID", "SourceID", "QualityControlLevelID"),
      indexCol = "LocalDateTime", pivotKey = "VariableCode",
      valueCol = "DataValue", domain = Seq("Temp-5", "pH-5"),
      sentinels = Map("Temp-5" -> -9999.0, "pH-5" -> -8888.0))
    val out = Files.createTempDirectory("odm-e2e").toString
    val up = new LocalDirUploader(
      Files.createTempDirectory("odm-res").toString)
    val written = Publish.publishAndUpload(spark, fact, spec, out,
      cv => Seq(s"Site: ${cv.head}"), up, "gamut")
    assert(written.size === 2)
    assert(up.listFiles("gamut") === Seq("10_30_1.csv", "20_30_1.csv"))
    assert(up.isPublic("gamut"))
  }

  test("odm series identity: key5 and surrogate odm_id") {
    val df = facts.toDS().toDF().select(Odm.odmId.as("odm_id"))
      .distinct().orderBy("odm_id")
    assert(df.as[String].collect().toSeq ===
      Seq("10_1_5_30_1", "10_2_5_30_1", "20_1_5_30_1", "20_2_5_30_1"))
  }

  test("reference filename composition") {
    assert(Publish.fileName("LR_A", "Temp", 30, 1)
      === "LR_A_Temp_SourceID_30_QC_1.csv")
    assert(Publish.fileName("LR_A", "Temp", 30, 1, Some(2024))
      === "LR_A_Temp_SourceID_30_QC_1_Year_2024.csv")
  }
}
