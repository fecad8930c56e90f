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

  private def withDir[A](f: String => A): A =
    withTempDir("graft-layout")(f)

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
  private def scannedRowsFor(dir: String,
      pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(dir).filter(pred)
    // run THIS frame's own plan (a derived count() would execute a
    // different queryExecution and leave these metrics untouched)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

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

  test("z-order clustering serves pushed predicates on EVERY z column") {
    withDir { root =>
      // two independent uniform-shuffled keys: a single-column range
      // cluster can serve one of them; the z-order serves both
      val data2 = spark.range(0, 400000)
        .select(((col("id") * 48271) % 400000).as("k1"),
          ((col("id") * 69621) % 400000).as("k2"),
          col("id").as("payload"))
      val opts = Map("parquet.block.size" -> (64 * 1024).toString)
      data2.repartition(4).write.options(opts)
        .mode("overwrite").parquet(s"$root/flat")
      LayoutOps.clusterWrite(data2, Seq("k1"), 4, s"$root/linear", opts)
      LayoutOps.zorderWrite(data2, Seq("k1", "k2"), 4, s"$root/z",
        bits = 8, extraWriteOpts = opts)
      // identical content
      assert(spark.read.parquet(s"$root/z")
        .as[(Long, Long, Long)].collect().sorted ===
        data2.as[(Long, Long, Long)].collect().sorted)
      val p1 = col("k1") >= 10000 && col("k1") < 35000  // 1/16 of k1
      val p2 = col("k2") >= 10000 && col("k2") < 35000  // 1/16 of k2
      val flat1 = scannedRowsFor(s"$root/flat", p1)
      val lin1 = scannedRowsFor(s"$root/linear", p1)
      val lin2 = scannedRowsFor(s"$root/linear", p2)
      val z1 = scannedRowsFor(s"$root/z", p1)
      val z2 = scannedRowsFor(s"$root/z", p2)
      // the flat layout reads everything; the linear cluster serves
      // its own key but is blind on the other; the z layout skips on
      // BOTH dimensions — measured via scan metrics, not plan strings
      assert(flat1 >= 350000L, s"flat1=$flat1")
      assert(lin1 <= flat1 / 10, s"lin1=$lin1 flat1=$flat1")
      assert(lin2 >= (flat1 * 3) / 4, s"lin2=$lin2 flat1=$flat1")
      assert(z1 <= flat1 / 4, s"z1=$z1 flat1=$flat1")
      assert(z2 <= flat1 / 4, s"z2=$z2 flat1=$flat1")
    }
  }

  test("z-order write rejects degenerate geometry") {
    withDir { root =>
      val df = Seq((1L, 2L)).toDF("a", "b")
      intercept[IllegalArgumentException] {
        LayoutOps.zorderWrite(df, Seq("a"), 1, s"$root/x")
      }
      intercept[IllegalArgumentException] {
        // bits past the cap: 31 would also overflow 1 << bits into
        // Int.MinValue while passing a cols*bits <= 63 check
        LayoutOps.zorderWrite(df, Seq("a", "b"), 1, s"$root/x",
          bits = 31)
      }
      intercept[IllegalArgumentException] {
        // an all-null z column has no quantile cuts
        LayoutOps.zorderWrite(Seq((Option.empty[java.lang.Long], 2L))
          .toDF("a", "b"), Seq("a", "b"), 1, s"$root/x")
      }
    }
  }

  test("z-order preserves a caller column named __z; self-overwrite rejected") {
    withDir { root =>
      // __z is a legal user column — the op's working columns must
      // dodge it, not silently destroy it
      val df = Seq((1L, 10L, "keep1"), (2L, 20L, "keep2"),
        (3L, 30L, "keep3")).toDF("a", "b", "__z")
      LayoutOps.zorderWrite(df, Seq("a", "b"), 1, s"$root/z", bits = 2)
      assert(spark.read.parquet(s"$root/z")
        .as[(Long, Long, String)].collect().sorted ===
        Seq((1L, 10L, "keep1"), (2L, 20L, "keep2"), (3L, 30L, "keep3")))
      // overwriting the directory the frame reads would destroy the
      // source mid-job — both clustered writes refuse
      val back = spark.read.parquet(s"$root/z")
      intercept[IllegalArgumentException] {
        LayoutOps.zorderWrite(back, Seq("a", "b"), 1, s"$root/z")
      }
      intercept[IllegalArgumentException] {
        LayoutOps.clusterWrite(back, Seq("a"), 1, s"$root/z")
      }
    }
  }

  test("clustered compaction restores row-group skipping after appends") {
    withDir { root =>
      val opts = Map("parquet.block.size" -> (64 * 1024).toString)
      LayoutOps.clusterWrite(data, Seq("k"), 4, s"$root/fact", opts)
      // accreted appends: small unsorted files, the shape a streaming
      // sink or per-batch ingest leaves behind a clustered write
      val appended = spark.range(400000, 500000)
        .select(((col("id") * 48271) % 400000).as("k"),
          col("id").as("payload"))
      appended.repartition(8).write.options(opts).mode("append")
        .parquet(s"$root/fact")
      val expected = data.unionByName(appended)
        .as[(Long, Long)].collect().sorted
      // the composition trap: round-robin compaction preserves content
      // but merges sorted runs arbitrarily, widening row-group key
      // ranges — the pushed slice reads a large multiple of what the
      // clustered layout serves (not necessarily EVERYTHING: round
      // robin happens to preserve within-partition order, so some
      // residual skipping survives; the gap is what matters)
      LayoutOps.compact(spark, s"$root/fact", s"$root/naive", 4)
      val naive = scannedRows(s"$root/naive")
      // layout-preserving compaction: the SAME slice assertion a fresh
      // clustered write satisfies holds post-compaction, content
      // byte-identical, file count collapsed, staging cleaned up
      LayoutOps.compactClusteredInPlace(spark, s"$root/fact", Seq("k"),
        4, extraWriteOpts = opts)
      val compacted = scannedRows(s"$root/fact")
      assert(compacted <= 500000L / 10, s"compacted=$compacted")
      assert(naive >= 10 * compacted,
        s"compacted=$compacted naive=$naive")
      assert(spark.read.parquet(s"$root/fact")
        .as[(Long, Long)].collect().sorted === expected)
      assert(!Files.exists(java.nio.file.Paths.get(s"$root/fact__compact")))
      assert(!Files.exists(java.nio.file.Paths.get(s"$root/fact__old")))
    }
  }

  test("z-order compaction re-clusters BOTH predicate columns after appends") {
    withDir { root =>
      val opts = Map("parquet.block.size" -> (64 * 1024).toString)
      val base = spark.range(0, 400000)
        .select(((col("id") * 48271) % 400000).as("k1"),
          ((col("id") * 69621) % 400000).as("k2"),
          col("id").as("payload"))
      LayoutOps.zorderWrite(base, Seq("k1", "k2"), 4, s"$root/z",
        bits = 8, extraWriteOpts = opts)
      val appended = spark.range(400000, 500000)
        .select(((col("id") * 48271) % 400000).as("k1"),
          ((col("id") * 69621) % 400000).as("k2"),
          col("id").as("payload"))
      appended.repartition(8).write.options(opts).mode("append")
        .parquet(s"$root/z")
      LayoutOps.compactClusteredInPlace(spark, s"$root/z",
        Seq("k1", "k2"), 4, zorder = true, bits = 8,
        extraWriteOpts = opts)
      val p1 = col("k1") >= 10000 && col("k1") < 35000
      val p2 = col("k2") >= 10000 && col("k2") < 35000
      val total = 500000L
      val z1 = scannedRowsFor(s"$root/z", p1)
      val z2 = scannedRowsFor(s"$root/z", p2)
      // the fresh-write assertion (both z columns skip) holds on the
      // compacted layout — measured, not asserted-by-plan-string
      assert(z1 <= total / 4, s"z1=$z1")
      assert(z2 <= total / 4, s"z2=$z2")
      assert(spark.read.parquet(s"$root/z")
        .as[(Long, Long, Long)].collect().sorted ===
        base.unionByName(appended).as[(Long, Long, Long)]
          .collect().sorted)
    }
  }

  test("compactGenerations sortWithin orders rows inside rewritten files") {
    withDir { root =>
      val dir = s"$root/art"
      // a tiny (ingest, band)-partitioned artifact with shuffled values
      def gen(g: Long, seed: Long) = spark.range(0, 1000)
        .select(((col("id") * seed) % 1000).as("v"),
          (col("id") % 4).as("band"), lit(g).as("ingest"))
      gen(0L, 48271L).write.mode("overwrite")
        .partitionBy("ingest", "band").parquet(dir)
      gen(1L, 69621L).write.mode("append")
        .partitionBy("ingest", "band").parquet(dir)
      val expected = spark.read.parquet(dir)
        .as[(Long, Long, Long)].collect().map(t => (t._1, t._3)).sorted
      LayoutOps.compactGenerations(spark, dir, "band",
        sortWithin = Seq("v"))
      // content preserved (ingest collapses to the max generation)
      assert(spark.read.parquet(dir).as[(Long, Long, Long)]
        .collect().map(t => (t._1, t._3)).sorted === expected)
      // every rewritten file is internally sorted on v
      def files(p: Path): Seq[Path] = {
        if (!Files.isDirectory(p)) return Seq(p)
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala.toSeq.flatMap(files)
        } finally s.close()
      }
      val parts = files(java.nio.file.Paths.get(dir))
        .filter(_.getFileName.toString.startsWith("part-"))
      assert(parts.nonEmpty)
      for (f <- parts) {
        val vs = spark.read.parquet(f.toString)
          .select("v").as[Long].collect()
        assert(vs === vs.sorted, s"file $f not sorted on v")
      }
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
