package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashMerge
import graft.io.BucketedIO
import graft.operators.SkewOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash merge aggregator is elementwise min with partial merge") {
    val df = Seq(
      ("a", Seq(5L, 1L, 9L)),
      ("a", Seq(3L, 7L, 2L)),
      ("b", Seq(8L, 8L, 8L))
    ).toDF("g", "sig").repartition(3) // force cross-partition merge
    val out = df.groupBy(col("g"))
      .agg(MinHashMerge(3)(col("sig")).as("sketch"))
      .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(out === Seq(("a", Seq(3L, 1L, 2L)), ("b", Seq(8L, 8L, 8L))))
  }

  test("CC loops run on a reliable checkpoint dir and clean up as they go") {
    import graft.operators.DedupOps
    // cluster-deployment mode: graft.checkpoint.dir switches the
    // fixpoint loops from localCheckpoint (blocks die with their
    // executor) to reliable checkpoint files that survive executor loss
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set("graft.checkpoint.dir", dir)
    try {
      val docs = (1L to 7L).toDF("doc_id")
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
      val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        5L -> 5L, 6L -> 5L, 7L -> 7L)
      type CC = (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame
      val loops: Seq[CC] = Seq(
        DedupOps.duplicateClusters(_, _, "doc_id"),
        DedupOps.duplicateClustersStar(_, _, "doc_id"))
      for (fn <- loops) {
        val got = fn(docs, pairs)
        // the result is a self-contained checkpoint LEAF: its plan must
        // not reference the loop's internal iterates (whose checkpoint
        // files were released before return) — losing a result block on
        // a cluster recomputes from the result's own checkpoint, never
        // through deleted iterate files
        assert(got.queryExecution.logical
          .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
        assert(got.orderBy("doc_id").as[(Long, Long)].collect().toSeq
          === want)
        DedupOps.free(got)
      }
      // deterministic release: every superseded iterate's rdd-N
      // checkpoint directory was deleted when its round ended, and
      // free() deleted the results' own — no accumulation across a
      // long fixpoint run
      val leftover = new java.io.File(dir).listFiles().toSeq
        .flatMap(d => Option(d.listFiles()).toSeq.flatten)
        .filter(_.getName.startsWith("rdd-"))
      assert(leftover.isEmpty, s"checkpoints not released: $leftover")
    } finally {
      spark.conf.unset("graft.checkpoint.dir")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("threshold source mix is a same-order prefix with concentrated quota") {
    import graft.operators.SourceMix
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val quota = SourceMix.quotas(docs, totalBudget = 100L).persist()
    val exact = SourceMix.exactMix(docs, quota)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val approx = SourceMix.thresholdMix(docs, quota)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // same selection semantics: both paths select a prefix of the SAME
    // per-source hash order, so within each source one selection
    // contains the other — never two disjoint-ish samples
    val bySrc = (exact.map(_._1) ++ approx.map(_._1))
    for (s0 <- bySrc) {
      val e = exact.filter(_._1 == s0).map(_._2)
      val a = approx.filter(_._1 == s0).map(_._2)
      assert(e.subsetOf(a) || a.subsetOf(e),
        s"source $s0: selections are not nested prefixes")
    }
    // approximate quota concentrates: per source within n_s ± 4·√n_s ± 2
    // (binomial bound, deterministic here — the corpus is fixed)
    val want = quota.select("source", "n_s").as[(String, Long)]
      .collect().toMap
    for ((s0, n) <- want) {
      val got = approx.count(_._1 == s0).toLong
      val tol = 4 * math.sqrt(n.toDouble).ceil.toLong + 2
      assert(math.abs(got - n) <= tol,
        s"source $s0: got $got docs for quota $n (tol $tol)")
    }
    quota.unpersist()
  }

  test("hierarchical seq-pack equals the global cumsum without a whole-group window") {
    import graft.operators.PackOps
    import org.apache.spark.sql.expressions.Window
    val langs = Array("en", "de", "zh")
    // 999 rows over 3 langs with shardSize 64 → ~16 shards: every shard
    // boundary and the empty-prefix head are exercised
    val rows = (0L until 999L)
      .map(i => (langs((i % 3).toInt), i, i % 7 + 1))
      .toDF("lang", "doc_id", "toks")
    val packed = PackOps.packBins(rows, "lang", "doc_id", "toks",
      budget = 50L, shardSize = 64L)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = rows
      .withColumn("prefix", coalesce(sum("toks").over(w), lit(0L)))
      .withColumn("bin", floor(col("prefix") / 50L).cast("long"))
    val got = packed.select("lang", "doc_id", "prefix", "bin")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = naive.select("lang", "doc_id", "prefix", "bin")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the 100 TB property: no window over raw rows may partition by the
    // low-cardinality group alone — only the per-shard offset table
    // (one row per shard, behind an Aggregate) gets a single-key window
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = packed.queryExecution.optimizedPlan.collect {
      case lw: LWindow => lw
    }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.size < 2).foreach { lw =>
      assert(lw.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"single-key window must run over the per-shard aggregate, not raw rows:\n$lw")
    }
    assert(wins.exists(_.partitionSpec.size == 2),
      s"expected a (group, shard) window:\n${wins.mkString("\n")}")
  }

  test("salted join preserves exact join multiplicity") {
    val large = (1L to 1000L).map(i => (i % 3, i)).toDF("k", "id")
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "tag")
    val salted = SkewOps.saltedJoin(large, small, "k", 8, col("id"))
    val plain = large.join(small, Seq("k"))
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = (1L to 500L).map(i => (i % 2, i.toDouble)).toDF("k", "v")
    val out = SkewOps.saltedAgg(df, "k", 4, col("v"),
        partial = Seq(sum(col("v")).as("ps"), count(lit(1)).as("pc")),
        finalAgg = Seq(sum(col("ps")).as("s"), sum(col("pc")).as("c")))
      .orderBy("k").as[(Long, Double, Long)].collect().toSeq
    val direct = df.groupBy("k")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(Long, Double, Long)].collect().toSeq
    assert(out === direct)
  }

  test("partitioned fact layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part-fact").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(plan.contains("= purchase)"), plan)
    // only the purchase partition's rows are read
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    assert(q.count() === expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1L to 200L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 200L).map(i => (i, s"b$i")).toDF("k", "vb")
    // clear any stale table/location from a previous test JVM
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    BucketedIO.writeBucketed(a, "bkt_a", "k", 4)
    BucketedIO.writeBucketed(b, "bkt_b", "k", 4)
    val joined = spark.table("bkt_a").hint("merge")
      .join(spark.table("bkt_b"), Seq("k"))
    assert(joined.count() === 200)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
  }
}
