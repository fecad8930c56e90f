package graft

import org.apache.spark.sql.functions._

/** Invariant gates for the round-4 pipeline-signal queries (t10
  * duplicate-gram fraction, t11 TF-IDF top terms, x10 funnel report,
  * s7 PQ-ADC top-k) over the sf0.001 gate corpus. The oracle hash
  * compare pins exact values; these specs pin the SEMANTIC contracts
  * that must survive any future rewrite: count conservation against
  * independently-computed token counts, ranking well-formedness, stage
  * monotonicity, and cross-query consistency with x8.
  */
class PipelineSignalsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("registry: every oracle references a declared query") {
    // an orphaned oracleSql key (query renamed, oracle left behind)
    // would silently stop being checked — the driver only compares
    // oracles for output dirs that exist
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("t10: gram occurrences conserve token counts and the ratio is exact") {
    val rows = SparkEntry.queries("t10_dup_gram_frac")(spark, d)
      .select("doc_id", "total_grams", "dup_grams", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // a doc with >= 3 tokens has exactly n_tok - 2 3-gram occurrences
    val nTok = Tables.documents(spark, d)
      .select(col("doc_id"),
        size(operators.TextOps.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, total, dup, frac) =>
      assert(total === nTok(id) - 2, s"doc $id")
      assert(dup >= 0 && dup <= total, s"doc $id")
      assert(frac === math.floor(dup * 10000.0 / total + 0.5) / 10000.0,
        s"doc $id")
    }
    // every doc with >= 3 tokens appears exactly once
    assert(rows.length === nTok.count(_._2 >= 3))
  }

  test("t11: per-doc rankings are contiguous and scores recompute exactly") {
    val out = SparkEntry.queries("t11_tfidf_top")(spark, d)
      .select("doc_id", "token", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    val nTotal = Tables.documents(spark, d).count()
    out.foreach { case (_, _, tf, df, score, _) =>
      assert(df >= 1 && tf >= 1)
      assert(score === tf * ((nTotal * 1000000L) / df))
    }
    out.groupBy(_._1).foreach { case (id, rs) =>
      val ranks = rs.map(_._6).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"doc $id")
      assert(ranks.length <= 3, s"doc $id")
    }
  }

  test("x10: funnel stages are monotone and the last equals x8's corpus") {
    val f = SparkEntry.queries("x10_funnel")(spark, d)
      .select("source", "n_total", "n_dedup", "n_quality", "n_clean",
        "n_train")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(f.nonEmpty)
    f.foreach { case (src, t, d1, q, c, tr) =>
      assert(t >= d1 && d1 >= q && q >= c && c >= tr, src)
    }
    val x8Total = SparkEntry.queries("x8_corpus_final")(spark, d)
      .agg(sum("n_docs")).as[Long].head()
    assert(f.map(_._6).sum === x8Total)
  }

  test("s8: IVFPQ candidates share the query's trained cell") {
    spark.catalog.clearCache() // isolate from earlier suites' frames
    val out = SparkEntry.queries("s8_ivfpq_topk")(spark, d)
      .select("q_id", "vec_id", "cell", "adc_dist", "rank")
      .as[(Long, Long, Long, Double, Long)].collect()
    // serving queries must not leak cached frames into the session
    // (the old per-query-branch shape persisted the encoded frame and
    // never released it)
    assert(spark.sharedState.cacheManager.isEmpty,
      "s8 left persisted frames behind")
    assert(out.nonEmpty)
    // every candidate row carries the cell it was scanned from; it
    // must equal the query's own assignment under the SAME trained
    // quantizer (shared builder — the routing cannot drift from the
    // index it claims to probe)
    val e = operators.SimilarityOps.withNorm(
      Tables.embeddings(spark, d), "embedding", "n")
    val cents = operators.SimilarityOps.trainIvf(e, 64, 2)
    val cellOf = e.withColumn("cell",
      operators.SimilarityOps.ivfAssign(cents, 64))
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    out.foreach { case (q, v, cell, dist, _) =>
      assert(cell === cellOf(q), s"q $q routed to ${cellOf(q)}")
      assert(cell === cellOf(v), s"candidate $v not in q's cell")
      assert(dist >= 0.0)
    }
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._5).sorted.toSeq === (1L to rs.length).toSeq, s"q $q")
      assert(rs.sortBy(_._5).map(_._4).toSeq ===
        rs.map(_._4).sorted.toSeq, s"q $q rank order")
    }
  }

  test("s9: multi-probe + re-rank is exact-ordered and dominates single-probe recall") {
    spark.catalog.clearCache() // isolate from earlier suites' frames
    val out = SparkEntry.queries("s9_ivfpq_multiprobe")(spark, d)
      .select("q_id", "vec_id", "sim", "adc_dist", "rank")
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "s9 left persisted frames behind")
    assert(out.nonEmpty)
    // final ranking follows EXACT cosine (the re-rank contract), with
    // contiguous ranks per query
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._5).sorted.toSeq === (1L to rs.length).toSeq, s"q $q")
      assert(rs.sortBy(_._5).map(-_._3).toSeq ===
        rs.map(-_._3).sorted.toSeq, s"q $q not exact-cosine ordered")
      assert(!rs.exists(_._2 == q), s"q $q includes itself")
    }
    // recall@k vs the exact brute-force top-k must be at least
    // single-probe s8's: more probed cells + exact re-rank can only
    // recover neighbors, never lose them
    def recallOf(rows: Array[(Long, Long)]): Double = {
      val exact = SparkEntry.queries("s1_cosine_topk")(spark, d)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
      rows.count(exact.contains).toDouble / exact.size
    }
    val r9 = recallOf(out.map(r => (r._1, r._2)))
    val r8 = recallOf(
      SparkEntry.queries("s8_ivfpq_topk")(spark, d)
        .select("q_id", "vec_id").as[(Long, Long)].collect())
    assert(r9 >= r8, s"multi-probe recall $r9 < single-probe $r8")
  }

  test("s7: PQ-ADC top-k is well-formed and reproducible") {
    spark.catalog.clearCache() // isolate from earlier suites' frames
    def run() = SparkEntry.queries("s7_pq_adc_topk")(spark, d)
      .select("q_id", "vec_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._4))
    val a = run()
    val b = run()
    assert(spark.sharedState.cacheManager.isEmpty,
      "s7 left persisted frames behind")
    assert(a.toSeq === b.toSeq) // integer-exact training => reproducible
    assert(a.forall(_._3 >= 0.0)) // squared distances
    a.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length).toSeq, s"q $q")
      assert(!rs.exists(_._2 == q), s"q $q includes itself")
      // ranks follow ascending distance
      assert(rs.sortBy(_._4).map(_._3).toSeq ===
        rs.map(_._3).sorted.toSeq, s"q $q")
    }
  }
}
