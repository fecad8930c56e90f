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
      // the version API sees exactly the retained window, and a
      // pruned version fails with the window in the message instead
      // of a bare missing-path error
      assert(CdcOps.listVersions(spark, root.toString) === Seq(1, 2))
      assert(CdcOps.readVersion(spark, root.toString, 2).count() ===
        oneShot.size.toLong)
      assert(intercept[IllegalArgumentException] {
        CdcOps.readVersion(spark, root.toString, 0)
      }.getMessage.contains("retained versions: 1, 2"))
      // a replay of the LAST batch must still be possible: its input
      // version (snap1) is inside the window by the retain >= 1 floor
      assert(intercept[IllegalArgumentException] {
        CdcOps.streamApply(spark, b, log, Seq("o_orderkey"), "seq",
          "op", nFiles = 2, s"$root-x", retainVersions = 0)
      }.getMessage.contains("retainVersions"))
    } finally rmTree(root)
  }

  test("re-invoking a completed chain does NOT rewrite the seed — " +
      "no resurrected pruned version, no full-base write on resume") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-resume")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      val first = CdcOps.streamApply(spark, b, log, Seq("o_orderkey"),
          "seq", "op", nFiles = 2, root.toString, retainVersions = 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(!java.nio.file.Files.exists(root.resolve("snap0")))
      // resume (the crash-recovery path is literally re-invocation):
      // the seed must be skipped — a re-written snap0 would linger
      // forever because the committed batches that pruned it never
      // replay
      val resumed = CdcOps.streamApply(spark, b, log,
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString,
          retainVersions = 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(resumed === first)
      assert(!java.nio.file.Files.exists(root.resolve("snap0")),
        "resume resurrected the retention-pruned seed snapshot")
      assert(CdcOps.listVersions(spark, root.toString) === Seq(1, 2))
    } finally rmTree(root)
  }

  test("an EMPTY changelog is a quiet period: the chain serves the " +
      "base, exactly the batch oracle's answer") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-empty")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      val got = CdcOps.streamApply(spark, b, log.where(lit(false)),
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(got ===
        b.as[(Long, Long, Double, String)].collect().toSeq.sorted)
    } finally rmTree(root)
  }

  test("quiet-period-THEN-data on one root: the empty tick stages " +
      "nothing and pins nothing, and the later real log processes " +
      "and matches the batch oracle") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-quiet-then-data")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      // quiet tick first: serves the base; the OLD behavior wrote a
      // zero-count signature here, which made the real arrivals below
      // fail the different-frame guard instead of processing
      val quiet = CdcOps.streamApply(spark, b, log.where(lit(false)),
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(quiet ===
        b.as[(Long, Long, Double, String)].collect().toSeq.sorted)
      // a SECOND quiet tick must not re-pay the O(base) seed write —
      // quiet ticks never create the checkpoint, so the seed skip has
      // to key on the seeded state itself (observable: the completed
      // snapshot's marker mtime is untouched)
      val marker = new org.apache.hadoop.fs.Path(
        s"$root/snap0/_SUCCESS")
      val fs = marker.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val mtime0 = fs.getFileStatus(marker).getModificationTime
      val quiet2 = CdcOps.streamApply(spark, b, log.where(lit(false)),
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(quiet2 === quiet)
      assert(fs.getFileStatus(marker).getModificationTime === mtime0,
        "the second quiet tick re-ran the full seed write")
      val got = CdcOps.streamApply(spark, b, log,
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      val oracle = CdcOps.applyChangelog(b, log,
          Seq("o_orderkey"), "seq", "op")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(got === oracle)
    } finally rmTree(root)
  }

  test("a quiet tick AFTER a data replay serves the current state — " +
      "even with the seed snapshot retention-pruned") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-data-then-quiet")
    try {
      val (b, log) = ExtraQueries.cdcFrames(spark, d)
      val first = CdcOps.streamApply(spark, b, log, Seq("o_orderkey"),
          "seq", "op", nFiles = 2, root.toString, retainVersions = 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      // retention reaped snap0 — the old staged==0 path read exactly
      // that and threw; the quiet tick must serve snap2 instead
      assert(!java.nio.file.Files.exists(root.resolve("snap0")))
      val quiet = CdcOps.streamApply(spark, b, log.where(lit(false)),
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString,
          retainVersions = 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(quiet === first)
    } finally rmTree(root)
  }

  test("staging works through an explicit file: URI (Hadoop-path " +
      "I/O, not local-path assumptions)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-uri")
    try {
      val log = Seq((1L, 1L, "U", 10L), (2L, 2L, "U", 20L),
        (3L, 3L, "U", 30L)).toDF("k", "seq", "op", "v")
      // the regression: a non-plain-local root silently staged ZERO
      // batches (the renumber loop scanned a POSIX path named
      // "file:/..."), and every streaming twin then served its seed
      // as the final result
      val staged = graft.streaming.StreamingOps.stageOrderedArrivals(
        log, "seq", nFiles = 3, s"file:$root/arrivals")
      assert(staged === 3)
      for (i <- 0 until 3)
        assert(java.nio.file.Files.exists(
          root.resolve(f"arrivals/b$i%03d.parquet")),
          s"range file $i missing")
    } finally rmTree(root)
  }

  // ---- incremental aggregate maintenance ----

  // k1: in-place update (same group, new measure); k2: delete (g1
  // loses a member); k3: update that MOVES groups (g2 dies, g3 is
  // born); k4: insert into a brand-new group. Every maintenance path:
  // -old/+new same group, -old only, -old one group +new another,
  // +new only, group death, group birth.
  private def mvBase = Seq(
    (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L)
  ).toDF("k", "grp", "x")
  private def mvLog = Seq(
    (1L, 1L, "U", "g1", 15L),
    (2L, 1L, "D", "g1", 0L),
    (3L, 1L, "U", "g3", 31L),
    (4L, 1L, "U", "g4", 40L)
  ).toDF("k", "seq", "op", "grp", "x")

  test("maintained aggregate ≡ recompute over the applied snapshot") {
    val prevAgg = mvBase.groupBy("grp")
      .agg(sum("x").as("x"), count(lit(1)).as("n"))
    val maintained = CdcOps.maintainAggs(prevAgg, mvBase, mvLog,
        Seq("k"), "seq", "op", dims = Seq("grp"), sumCols = Seq("x"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    val recomputed = CdcOps.applyChangelog(mvBase, mvLog,
        Seq("k"), "seq", "op")
      .groupBy("grp").agg(sum("x").as("x"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(maintained === recomputed)
    // the classes really happened: g2 died, g3/g4 were born
    assert(maintained === Seq(
      ("g1", 15L, 1L), ("g3", 31L, 1L), ("g4", 40L, 1L)))
  }

  test("maintenance touches the base only via a hash semi-join") {
    val prevAgg = mvBase.groupBy("grp")
      .agg(sum("x").as("x"), count(lit(1)).as("n"))
    val plan = CdcOps.maintainAggs(prevAgg, mvBase, mvLog,
        Seq("k"), "seq", "op", dims = Seq("grp"), sumCols = Seq("x"))
      .queryExecution.executedPlan.toString
    // the churn-keyed probe of the base: semi join, hash-built, never
    // sorted (the base is the 100 TB side — the agg-sized full-outer
    // merge may sort all it likes); no window anywhere
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, plan)
    assert(semiLines.forall(_.contains("HashJoin")), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("a NULL group key is one group in both maintenance paths") {
    // null is a legitimate group under groupBy; equality-based joins
    // would either split it (delta merge) or let it dodge both the
    // recompute and the eviction (group pruning). k10 lives in the
    // null group and gets updated; k11 joins the null group from g1.
    val base = mvBase.unionByName(Seq((10L, Option.empty[String], 7L))
      .toDF("k", "grp", "x"))
    val log = mvLog.unionByName(Seq(
      (10L, 1L, "U", Option.empty[String], 9L),
      (11L, 1L, "U", Option.empty[String], 5L))
      .toDF("k", "seq", "op", "grp", "x"))
    val applied = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
    val sumPrev = base.groupBy("grp")
      .agg(sum("x").as("x"), count(lit(1)).as("n"))
    val sumMaint = CdcOps.maintainAggs(sumPrev, base, log,
        Seq("k"), "seq", "op", dims = Seq("grp"), sumCols = Seq("x"))
      .as[(Option[String], Long, Long)].collect().toSeq.sortBy(_.toString)
    val sumRecomp = applied.groupBy("grp")
      .agg(sum("x").as("x"), count(lit(1)).as("n"))
      .as[(Option[String], Long, Long)].collect().toSeq.sortBy(_.toString)
    assert(sumMaint === sumRecomp)
    assert(sumMaint.exists { case (g, x, n) => g.isEmpty && x == 14L && n == 2L })
    def aggFn(rows: org.apache.spark.sql.DataFrame) =
      rows.groupBy("grp").agg(min("x").as("mn"), max("x").as("mx"),
        count(lit(1)).as("n"))
    val mmMaint = CdcOps.maintainByRecompute(aggFn(base), base, log,
        Seq("k"), "seq", "op", dims = Seq("grp"), aggFn)
      .as[(Option[String], Long, Long, Long)].collect().toSeq
      .sortBy(_.toString)
    val mmRecomp = aggFn(applied)
      .as[(Option[String], Long, Long, Long)].collect().toSeq
      .sortBy(_.toString)
    assert(mmMaint === mmRecomp)
    assert(mmMaint.exists { case (g, mn, mx, n) =>
      g.isEmpty && mn == 5L && mx == 9L && n == 2L })
  }

  test("group-pruned recompute maintains min/max through extreme-deletes") {
    def aggFn(rows: org.apache.spark.sql.DataFrame) =
      rows.groupBy("grp").agg(min("x").as("mn"), max("x").as("mx"),
        count(lit(1)).as("n"))
    // k2 holds g1's MAX (20): deleting it must drop the max to 15 —
    // the case subtraction-based maintenance cannot express. g2's row
    // moves to g3 (group death + birth), g4 is born; an all-groups-
    // untouched view would carry over verbatim.
    val maintained = CdcOps.maintainByRecompute(aggFn(mvBase), mvBase,
        mvLog, Seq("k"), "seq", "op", dims = Seq("grp"), aggFn)
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    val recomputed = aggFn(CdcOps.applyChangelog(mvBase, mvLog,
        Seq("k"), "seq", "op"))
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(maintained === recomputed)
    assert(maintained === Seq(
      ("g1", 15L, 15L, 1L), ("g3", 31L, 31L, 1L), ("g4", 40L, 40L, 1L)))
    // an untouched group really carries over: add one to the base
    val base2 = mvBase.unionByName(
      Seq((9L, "g9", 99L)).toDF("k", "grp", "x"))
    val m2 = CdcOps.maintainByRecompute(aggFn(base2), base2, mvLog,
        Seq("k"), "seq", "op", dims = Seq("grp"), aggFn)
    assert(m2.filter(col("grp") === "g9")
      .as[(String, Long, Long, Long)].head() === ("g9", 99L, 99L, 1L))
    // the carried leg is an anti-join of the previous aggregate —
    // untouched groups never re-aggregate
    val plan = m2.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
  }

  // ---- snapshot diff ----

  test("snapshot diff classifies adds, removes, changes; equals drop out") {
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (5L, Option.empty[String])).toDF("k", "v")
    val next = Seq((2L, Some("b")), (3L, Some("c2")), (4L, Some("d")),
      (5L, Some("x"))).toDF("k", "v")
    val out = CdcOps.snapshotDiff(prev, next, Seq("k"))
      .as[(Long, String, Option[String], Option[String])]
      .collect().toSeq.sorted
    assert(out === Seq(
      (1L, "R", Some("a"), None),        // only in prev
      (3L, "C", Some("c"), Some("c2")),  // payload changed
      (4L, "A", None, Some("d")),        // only in next
      (5L, "C", None, Some("x"))         // null → value is a change
      // 2 identical: not emitted
    ))
    // the diff is ONE keyed aggregation over the tagged union — no
    // join at all (one exchange, and nothing to zip when one version
    // is an in-plan composition over the other)
    val plan = CdcOps.snapshotDiff(prev, next, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("diffing a version against its own in-plan successor works") {
    // next CONTAINS prev as a subplan — the successive-version case
    // that breaks a join-over-union formulation in this Spark build
    val next = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
    val out = CdcOps.snapshotDiff(base, next, Seq("k"))
      .select("k", "change").as[(Long, String)].collect().toSeq.sorted
    assert(out === Seq((1L, "C"), (2L, "R"), (4L, "A")))
  }

  test("stream-maintained aggregate ≡ batch maintenance, versions retained") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files
      .createTempDirectory("graft-mv-retain")
    try {
      val (b, log) = ExtraQueries.incrAggFrames(spark, d)
      val streamed = CdcOps.streamMaintain(spark, b, log,
          Seq("o_orderkey"), "seq", "op", nFiles = 2, root.toString,
          dims = Seq("grp"), sumCols = Seq("price_tc"),
          retainVersions = 1)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val prevAgg = b.groupBy("grp")
        .agg(sum("price_tc").as("price_tc"), count(lit(1)).as("n"))
      val batch = CdcOps.maintainAggs(prevAgg, b, log,
          Seq("o_orderkey"), "seq", "op",
          dims = Seq("grp"), sumCols = Seq("price_tc"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(streamed === batch)
      // retention pruned BOTH version-0 artifacts; the in-window
      // versions of both chains exist
      assert(!java.nio.file.Files.exists(root.resolve("snap0")))
      assert(!java.nio.file.Files.exists(root.resolve("agg0")))
      assert((1 to 2).forall(i =>
        java.nio.file.Files.isDirectory(root.resolve(s"snap$i")) &&
          java.nio.file.Files.isDirectory(root.resolve(s"agg$i"))))
      // a quiet tick on the advanced root serves the same final
      // aggregate (agg0 is pruned — the old staged==0 path read it)
      val quiet = CdcOps.streamMaintain(spark, b,
          log.where(lit(false)), Seq("o_orderkey"), "seq", "op",
          nFiles = 2, root.toString, dims = Seq("grp"),
          sumCols = Seq("price_tc"), retainVersions = 1)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(quiet === streamed)
    } finally rmTree(root)
  }

  test("sparse sequence ranges stage fewer files and still complete") {
    // seqs cluster at the bottom of the range with one far outlier —
    // the CDC-LSN shape: range-cut staging leaves middle slots empty,
    // so fewer than nFiles files exist and the replay must run (and
    // the final version be derived from) the ACTUAL staged count
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-sparse")
    try {
      val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      val log = Seq(
        (1L, 1L, "U", "a1"), (2L, 2L, "U", "b1"),
        (3L, 10000L, "U", "c1")
      ).toDF("k", "seq", "op", "v")
      val streamed = CdcOps.streamApply(spark, base, log,
          Seq("k"), "seq", "op", nFiles = 4, root.toString,
          retainVersions = Int.MaxValue)
        .as[(Long, String)].collect().toSeq.sorted
      val oneShot = CdcOps.applyChangelog(base, log, Seq("k"), "seq", "op")
        .as[(Long, String)].collect().toSeq.sorted
      assert(streamed === oneShot)
      // only 2 of 4 range slots had rows -> versions 0..2, not 0..4
      assert(CdcOps.listVersions(spark, root.toString) === Seq(0, 1, 2))
    } finally rmTree(root)
  }

  test("a used root rejects a DIFFERENT changelog instead of serving stale") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdc-reuse")
    try {
      val base = Seq((1L, "a")).toDF("k", "v")
      val log1 = Seq((1L, 1L, "U", "a1")).toDF("k", "seq", "op", "v")
      val log2 = Seq((1L, 1L, "U", "a2")).toDF("k", "seq", "op", "v")
      CdcOps.streamApply(spark, base, log1, Seq("k"), "seq", "op",
        nFiles = 1, root.toString).collect()
      // same content: allowed (this is exactly how crash recovery
      // resumes) and the result is unchanged
      val again = CdcOps.streamApply(spark, base, log1, Seq("k"),
          "seq", "op", nFiles = 1, root.toString)
        .as[(Long, String)].collect().toSeq
      assert(again === Seq((1L, "a1")))
      // different content: the file-source checkpoint would silently
      // skip it — must fail loudly instead
      val ex = intercept[IllegalArgumentException] {
        CdcOps.streamApply(spark, base, log2, Seq("k"), "seq", "op",
          nFiles = 1, root.toString)
      }
      assert(ex.getMessage.contains("DIFFERENT arrivals"))
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
      val v1 = CdcOps.readVersion(spark, root.toString, 1)
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      val gen1Only = CdcOps.applyChangelog(b,
          log.filter(col("seq") === 1L), Seq("o_orderkey"), "seq", "op")
        .as[(Long, Long, Double, String)].collect().toSeq.sorted
      assert(v1 === gen1Only)
      assert(streamed !== v1) // generation 2 really changed the state
    } finally rmTree(root)
  }
}
