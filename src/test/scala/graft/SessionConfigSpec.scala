package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.io.ConfigSource
import graft.operators.EditSession

class SessionConfigSpec extends SparkSpec {
  import spark.implicits._

  test("edit session: edits stack, rollback walks lineage, close frees") {
    val base = Seq((1L, 10.0), (2L, 200.0), (3L, 30.0)).toDF("id", "v")
    val s0 = EditSession.open(base)
    val s1 = s0.edit(_.withColumn("sel", col("v") > 20.0))
    val s2 = s1.select("sel", col("v") > 100.0, intersect = true)
    assert(s2.depth === 2)
    assert(s2.df.filter(col("sel")).count() === 1) // only v=200
    assert(s1.df.filter(col("sel")).count() === 2) // rollback target intact
    assert(s2.rollback eq s1)
    assert(s2.rollbackAll eq s0)
    // conditional update on selection (M4/F10), then "save" semantics:
    // nothing mutated until an explicit write
    val s3 = s2.edit(d => d.withColumn("v",
      when(col("sel"), col("v") / 2).otherwise(col("v"))))
    assert(s3.df.agg(sum("v")).as[Double].head() === 10.0 + 100.0 + 30.0)
    assert(s0.df.agg(sum("v")).as[Double].head() === 240.0)
    s3.close()
  }

  test("config source round-trips the reference's selection 5-tuple") {
    val dir = Files.createTempDirectory("graft-cfg")
    val path = dir.resolve("ops.json")
    Files.writeString(path,
      """{"outputDir": "/tmp/out", "singleFile": true,
         "chunkYears": false,
         "selections": [
           {"site": 1, "variable": 2, "method": 3, "source": 4, "qcLevel": 0},
           {"site": 9, "variable": 8, "method": 7, "source": 6, "qcLevel": 1}
         ]}""")
    val cfg = ConfigSource.load(spark, path.toString)
    assert(cfg.outputDir === "/tmp/out")
    assert(cfg.singleFile && !cfg.chunkYears)
    assert(cfg.selections.map(_.odmId) === Seq("1_2_3_4_0", "9_8_7_6_1"))
  }
}
