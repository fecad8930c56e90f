package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MultimodalOps, TextOps}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("hash15 matches the DuckDB/JVM 60-bit md5 value") {
    val got = Seq("abc").toDF("s")
      .select(TextOps.hash15(col("s"))).as[Long].head()
    assert(got === 648541476951500027L) // ('0x'||substr(md5('abc'),1,15))::BIGINT
    assert(got === MultimodalOps.hash15Jvm("abc".getBytes("UTF-8")))
  }

  test("exact dedup: NULL-text docs are never duplicates of each " +
      "other — no group forms on the NULL fingerprint") {
    val df = Seq[(Long, String)]((1L, "same"), (2L, "same"),
      (3L, null), (4L, null)).toDF("doc_id", "text")
    val g = DedupOps.exactDupGroups(df, "text", "doc_id").collect()
    // one real duplicate group; the two null-text docs (routine in
    // scraped data) must not collapse into a shared group whose
    // survivors filter would silently drop one of them
    assert(g.length === 1)
    assert(g.head.getLong(1) === 1L && g.head.getLong(2) === 2L)
  }

  test("rolling hash folds chars base-31 mod 1e9+7") {
    val got = Seq("ab").toDF("t")
      .select(TextOps.rollingHash("t")).as[Long].head()
    assert(got === 97L * 31 + 98) // 'a'=97, 'b'=98
  }

  test("word shingles and char n-grams handle short inputs") {
    val df = Seq(("a b c d", "abcd"), ("a b", "ab")).toDF("w", "c")
    val sh = df.select(TextOps.wordShingles(col("w"), 3))
      .as[Seq[String]].collect().toSeq
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty)
    val ng = df.select(TextOps.charNgrams("c", 3))
      .as[Seq[String]].collect().toSeq
    assert(ng(0).toSet === Set("abc", "bcd"))
    assert(ng(1) === Seq.empty)
  }

  test("normalize lowercases and collapses whitespace") {
    val got = Seq("  The\tQuick   fox ").toDF("t")
      .select(TextOps.normalize(col("t"))).as[String].head()
    assert(got === "the quick fox")
  }

  test("count-min sketch never under-counts and is partition-invariant") {
    import graft.functions.CountMinSketch
    import graft.operators.DedupOps.MinHashP
    val (d, w) = (4, 16)
    val items = Seq.tabulate(500)(i => s"tok${i % 40}") // 40 distinct, skewed
    val df = items.toDF("tok")
      .withColumn("bh", TextOps.hash15(col("tok")) % MinHashP)
    def sketchOf(parts: Int): Seq[Long] =
      df.repartition(parts).agg(CountMinSketch(d, w)(col("bh")))
        .head.getSeq[Long](0)
    val sk = sketchOf(4)
    // partition-invariant: same sketch from 1 and 4 partitions
    assert(sk === sketchOf(1))
    // every row conserves the total item count
    (0 until d).foreach { r =>
      assert(sk.slice(r * w, (r + 1) * w).sum === items.size.toLong)
    }
    // no-undercount on every distinct item
    val est = df.distinct()
      .select(col("tok"),
        CountMinSketch.estimate(
          typedLit(sk), col("bh"), d, w).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (t, n) => assert(est(t) >= n, s"$t: ${est(t)} < $n") }
  }

  test("count-min sketch accepts negative input hashes (floorMod cells)") {
    import graft.functions.CountMinSketch
    val (d, w) = (4, 16)
    // raw Long hashes, half of them negative — the Aggregator contract
    // is any Long, not just the non-negative hash15 range the query
    // call sites happen to produce
    val hs = Seq(-1L, Long.MinValue, -987654321L, 42L, -42L, Long.MaxValue)
    val df = (hs ++ hs).toDF("bh") // every item twice
    val sk = df.agg(CountMinSketch(d, w)(col("bh"))).head.getSeq[Long](0)
    // no ArrayIndexOutOfBounds, every row conserves the item count
    (0 until d).foreach { r =>
      assert(sk.slice(r * w, (r + 1) * w).sum === (2 * hs.size).toLong)
    }
    // SQL-side estimate addresses the SAME cells (pmod mirror): each
    // distinct item occurs twice, so no estimate may be below 2
    val est = hs.toDF("bh").distinct()
      .select(CountMinSketch.estimate(typedLit(sk), col("bh"), d, w))
      .as[Long].collect()
    assert(est.forall(_ >= 2L), est.mkString(","))
  }

  test("duplicate clustering propagates the min id across chain components") {
    // chain 1-2-3-4 forces multiple propagation rounds (diameter 3);
    // 5-6 is a separate pair; 7 has no edges and maps to itself.
    val docs = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val got = DedupOps.duplicateClusters(docs, pairs, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("seeded clustering (bucket-local min) is result-identical in fewer rounds") {
    // LSH-shaped input: buckets whose member sets define the clusters.
    // Docs 1-4 share buckets transitively (1,2|2,3 in band 0; 3,4 in
    // band 1), 5-6 pair up, 7 is bucketed alone.
    val buckets = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (2L, 0L, 101L), (3L, 0L, 101L),
      (3L, 1L, 200L), (4L, 1L, 200L), (5L, 0L, 300L), (6L, 0L, 300L),
      (7L, 0L, 400L)).toDF("doc_id", "band", "bucket")
    val docs = (1L to 7L).toDF("doc_id")
    val pairs = DedupOps.lshCandidatePairs(buckets, "doc_id")
    val plain = DedupOps.duplicateClusters(docs, pairs, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val plainIters = DedupOps.lastIterations
    val seeded = DedupOps.duplicateClusters(docs, pairs, "doc_id",
        initLabels = Some(DedupOps.bucketLocalMin(buckets, "doc_id")))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val seededIters = DedupOps.lastIterations
    assert(seeded === plain) // the fixpoint is seed-independent
    assert(seeded === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // the seed IS round 1's neighbor-min, so the loop saves >= 1 round
    assert(seededIters < plainIters,
      s"seeded $seededIters vs unseeded $plainIters rounds")
  }

  test("large/small-star clustering collapses a chain past min-prop's reach") {
    // A 61-node chain has diameter 60: min-propagation needs 60 rounds
    // (capped here at 10 — each un-checkpointed round also grows the
    // plan, so high maxIter on a single JVM is driver-memory-bound),
    // the alternating star algorithm converges in O(log n).
    val docs = (0L to 60L).toDF("doc_id")
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      DedupOps.duplicateClusters(docs, pairs, "doc_id", maxIter = 10)
    }
    val got = DedupOps.duplicateClustersStar(docs, pairs, "doc_id")
    val rows = got.as[(Long, Long)].collect().toSeq
    got.unpersist()
    assert(rows.size === 61 && rows.forall(_._2 === 0L))
  }

  test("star clustering matches min-propagation on a pseudo-random graph") {
    // Deterministic scattered graph: multiple components, cycles,
    // reversed-order edges, isolated nodes.
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val pairs = (0L until 150L)
      .map(i => ((i * 37 + 11) % n, (i * i * 13 + 5) % n))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
    val star = DedupOps.duplicateClustersStar(docs, pairs, "doc_id")
    val prop = DedupOps.duplicateClusters(docs, pairs, "doc_id", 200)
    val s = star.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val p = prop.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    star.unpersist(); prop.unpersist()
    assert(s === p)
  }

  test("star clustering with no pairs is the identity mapping") {
    val docs = (1L to 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = DedupOps.duplicateClustersStar(docs, pairs, "doc_id")
    val rows = got.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    got.unpersist()
    assert(rows === Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("duplicate clustering with no pairs is the identity mapping") {
    val docs = (1L to 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = DedupOps.duplicateClusters(docs, pairs, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("exact dedup groups duplicates under one survivor") {
    val df = Seq((1L, "The cat"), (2L, "the  cat"), (3L, "a dog"))
      .toDF("id", "text")
    val out = DedupOps.exactDupGroups(df, "text", "id")
      .orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (3L, 1L)))
  }

  test("single-token simhash equals the token hash's low bits") {
    val tok = "spark"
    val expected = MultimodalOps.hash15Jvm(tok.getBytes("UTF-8")) & 0xFFFFL
    val got = Seq(tok).toDF("text")
      .withColumn("__ths", DedupOps.tokenHashes("text"))
      .select(DedupOps.simHash("__ths", 16)).as[Long].head()
    assert(got === expected)
  }

  test("minhash of a 3-token doc is the universal hash of its shingle") {
    val doc = "x y z"
    val base = MultimodalOps.hash15Jvm("x y z".getBytes("UTF-8")) %
      DedupOps.MinHashP
    val expected =
      (DedupOps.minHashA(0) * base + DedupOps.minHashB(0)) % DedupOps.MinHashP
    val got = DedupOps.withMinHash(Seq((1L, doc)).toDF("id", "text"),
        "text", 1)
      .select("mh0").as[Long].head()
    assert(got === expected)
  }

  test("re-signing an already-signed frame is refused — two " +
      "signature schemes would silently mix into corrupt buckets") {
    val df = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val signed = DedupOps.withMinHash(df, "text", 8)
    // re-tuning with a smaller k would overwrite mh0..mh3 and strand
    // mh4..mh7 from the old scheme
    assert(intercept[IllegalArgumentException] {
      DedupOps.withMinHash(signed, "text", 4)
    }.getMessage.contains("signature"))
    // a caller column colliding with a working name is refused too
    assert(intercept[IllegalArgumentException] {
      DedupOps.withMinHash(df.withColumn("__bh", lit(1)), "text", 4)
    }.getMessage.contains("__bh"))
  }

  test("identical docs collide in every LSH band and pair up once") {
    val df = Seq((1L, "p q r s t"), (2L, "p q r s t"), (3L, "u v w x y"))
      .toDF("doc_id", "text")
    val sig = DedupOps.withMinHash(df, "text", 4)
    val buckets = DedupOps.lshBuckets(sig, "doc_id", 4, 2)
    assert(buckets.count() === 6) // 3 docs × 2 bands
    val pairs = DedupOps.lshCandidatePairs(buckets, "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)))
  }

  test("jaccard is 1 on identical sets, 0 on disjoint") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d"))
    ).toDF("x", "y")
    val out = df.select(DedupOps.jaccard(col("x"), col("y")))
      .as[Double].collect().toSeq
    assert(out === Seq(1.0, 0.0))
  }
}
