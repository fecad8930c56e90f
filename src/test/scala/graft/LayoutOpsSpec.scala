package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Layout ops must be content-preserving AND measurably change the
  * physical read: a pushed range predicate over a clustered layout
  * reads a fraction of the rows (row-group skipping via min/max
  * stats), and compaction collapses the file count without touching a
  * row.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  private def withDir[A](f: String => A): A = {
    val dir = Files.createTempDirectory("graft-layout")
    try f(dir.toString)
    finally {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.forEach(rm) finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  // deterministic synthetic frame, big enough for many row groups:
  // k is uniform-shuffled so the UNclustered layout has full-range
  // row-group stats everywhere
  private def data = spark.range(0, 400000)
    .select(((col("id") * 48271) % 400000).as("k"),
      col("id").as("payload"))

  /** Rows the parquet reader emitted for a filtered scan (= rows in
    * the row groups that survived min/max pruning; record-level
    * parquet filtering is off by default in Spark).
    */
  private def scannedRows(dir: String): Long = {
    val df = spark.read.parquet(dir)
      .filter(col("k") >= 1000 && col("k") < 5000)
    // run THIS frame's own plan (a derived count() would execute a
    // different queryExecution and leave these metrics untouched)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("range clustering makes the pushed filter skip row groups") {
    withDir { root =>
      // small row groups so both layouts hold many of them
      val opts = Map("parquet.block.size" -> (64 * 1024).toString)
      data.repartition(4).write.options(opts)
        .mode("overwrite").parquet(s"$root/flat")
      LayoutOps.clusterWrite(data, Seq("k"), 4, s"$root/clustered", opts)
      // identical content
      assert(spark.read.parquet(s"$root/clustered")
        .as[(Long, Long)].collect().sorted ===
        spark.read.parquet(s"$root/flat")
          .as[(Long, Long)].collect().sorted)
      val (flat, clustered) =
        (scannedRows(s"$root/flat"), scannedRows(s"$root/clustered"))
      // the unclustered layout reads essentially everything (every
      // row group's k-range spans the filter); the clustered one
      // reads only the row groups covering [1000, 5000) — measured,
      // not asserted-by-plan-string
      assert(flat >= 350000L, s"flat=$flat")
      assert(clustered <= flat / 10,
        s"clustered=$clustered flat=$flat")
    }
  }

  test("compaction collapses the file count and preserves content") {
    withDir { root =>
      data.repartition(64).write.mode("overwrite").parquet(s"$root/small")
      def parts(p: String): Seq[Path] = {
        val s = Files.list(Files.createDirectories(
          java.nio.file.Paths.get(p)))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala.toSeq
            .filter(_.getFileName.toString.startsWith("part-"))
        } finally s.close()
      }
      assert(parts(s"$root/small").size === 64)
      // aliased spellings of the source dir must be rejected — an
      // overwrite into the dir being read destroys the source
      intercept[IllegalArgumentException] {
        LayoutOps.compact(spark, s"$root/small", s"$root/small/", 4)
      }
      LayoutOps.compact(spark, s"$root/small", s"$root/compact", 4)
      assert(parts(s"$root/compact").size === 4)
      assert(spark.read.parquet(s"$root/compact")
        .as[(Long, Long)].collect().sorted ===
        data.as[(Long, Long)].collect().sorted)
    }
  }
}
