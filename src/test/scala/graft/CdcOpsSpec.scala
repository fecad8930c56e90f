package graft

import org.apache.spark.sql.functions._
import graft.operators.CdcOps

/** Changelog application semantics: latest-wins per key, delete drops,
  * insert lands, untouched base survives — and the plan collapses the
  * changelog with a hash aggregation, not a per-key window sort.
  */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(rmTree) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")
  ).toDF("k", "v").withColumn("src", lit("base"))

  // k=1: updated twice (seq 2 wins); k=2: deleted AFTER an update;
  // k=3: untouched; k=4: pure insert; k=5: insert then delete (never
  // lands). Seqs deliberately arrive out of order.
  private def log = Seq(
    (1L, 2L, "U", "a2"), (1L, 1L, "U", "a1"),
    (2L, 2L, "D", "dead"), (2L, 1L, "U", "b1"),
    (4L, 1L, "U", "d"),
    (5L, 2L, "D", "dead"), (5L, 1L, "U", "e")
  ).toDF("k", "seq", "op", "v").withColumn("src", lit("cdc"))

  test("latest-wins apply: update, delete-after-update, insert, untouched") {
    val out = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(out === Seq(
      (1L, "a2", "cdc"), // latest update wins over seq 1
      (3L, "c", "base"), // untouched base row survives as-is
      (4L, "d", "cdc")   // pure insert lands
      // 2 and 5 end deleted
    ))
  }

  test("a null op fails loudly instead of acting as a silent delete") {
    val nullOp = Seq((3L, 1L, "c9")).toDF("k", "seq", "v")
      .withColumn("src", lit("cdc"))
      .withColumn("op", lit(null).cast("string"))
      .select("k", "seq", "op", "v", "src")
    val ex = intercept[Exception] {
      CdcOps.applyChangelog(base, nullOp, Seq("k"), "seq", "op").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("null op")), ex)
  }

  test("the changelog collapses by aggregation, never a whole-log window") {
    val plan = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    // max_by aggregate (SortAggregate pair: the string payload buffer
    // rules out hash agg, but the partial side still collapses keys
    // BEFORE the exchange) — and no window operator anywhere
    assert(plan.contains("max_by"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("tombstone apply drops keys without sorting the base") {
    // 99 is absent; 1 is listed twice (a noisy takedown feed) — both
    // harmless by the distinct-then-anti-join shape
    val tombs = Seq(1L, 1L, 5L, 99L).toDF("k")
    val applied = CdcOps.applyTombstones(base, tombs, Seq("k"))
    assert(applied.as[(Long, String, String)].collect().toSeq.sorted ===
      Seq((2L, "b", "base"), (3L, "c", "base")))
    val plan = applied.queryExecution.executedPlan.toString
    // the base (100 TB) side joins hash-built, never sort-merged
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("retention prunes expired snapshots; the result is unchanged") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-retain")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      // retain 1 predecessor: after batch 1 writes snap2, snap0 (the
      // base copy) falls off the window and must be GONE — unbounded
      // snapshot storage is the operational fire retention exists for
      val streamed = CdcOps.streamApply(spark, b, log,
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString,
          retainVersions = 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      val oneShot = CdcOps.applyChangelog(b, log,
          Seq("o_orderkey"), "seq", "op")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(streamed === oneShot)
      assert(!java.nio.file.Files.exists(root.resolve("snap0")))
      assert((1 to 2).forall(i => java.nio.file.Files
        .isDirectory(root.resolve(s"snap$i"))))
      // a replay of the LAST batch must still be possible: its input
      // version (snap1) is inside the window by the retain >= 1 floor
      assert(intercept[IllegalArgumentException] {
        CdcOps.streamApply(spark, b, log, Seq("o_orderkey"), "seq",
          "op", nFiles = 2, s"$root-x", retainVersions = 0)
      }.getMessage.contains("retainVersions"))
    } finally rmTree(root)
  }

  test("streaming apply ≡ one-shot apply; every version is a real snapshot") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-spec")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      // a leftover snapshot from some earlier, longer run sharing the
      // root: the current version is DERIVED from the staged batch
      // count, so this must never be adopted as the result
      Seq((0L, "junk")).toDF("o_orderkey", "junk")
        .write.parquet(s"$root/snap99")
      // retainVersions = MaxValue: the keep-every-version mode this
      // test's per-version assertions need
      val streamed = CdcOps.streamApply(spark, b, log,
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString,
          retainVersions = Int.MaxValue)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      val oneShot = CdcOps.applyChangelog(b, log,
          Seq("o_orderkey"), "seq", "op")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(streamed === oneShot)
      // versions snap0..snap2 all exist, and the INTERMEDIATE version
      // is exactly the one-generation apply — each micro-batch
      // produced a correct, queryable snapshot, not just the last
      assert((0 to 2).forall(i => java.nio.file.Files
        .isDirectory(root.resolve(s"snap$i"))))
      val v1 = spark.read.parquet(s"$root/snap1")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      val gen1Only = CdcOps.applyChangelog(b,
          log.filter(col("seq") === 1L), Seq("o_orderkey"), "seq", "op")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(v1 === gen1Only)
      assert(streamed !== v1) // generation 2 really changed the state
    } finally rmTree(root)
  }
}
