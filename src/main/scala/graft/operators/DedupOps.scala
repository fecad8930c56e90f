package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication primitives for training-data pipelines: exact
  * content-hash dedup, MinHash signatures + banded LSH candidate
  * generation, SimHash, and n-gram Jaccard similarity.
  *
  * Scale design (100 TB): every step before the LSH bucket join is a
  * per-row codegen'd projection (no UDFs, no shuffle). The only shuffles
  * are (a) the groupBy on the 60-bit content hash for exact dedup —
  * which AQE handles like any high-cardinality aggregation — and (b) the
  * band-bucket self-join, whose key (bandId, bucketHash) is exactly the
  * LSH guarantee that bucket sizes stay tiny, so the join explodes only
  * genuinely-similar groups. Pairwise Jaccard is reserved for candidate
  * verification, never run all-pairs.
  */
object DedupOps {

  /** Exact dedup groups: one row per distinct normalized content hash
    * with the survivor id (min), duplicate count. Survivor choice is
    * deterministic.
    */
  def exactDupGroups(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol),
        TextOps.hash15(TextOps.normalize(col(textCol))).as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** MinHash universal-hash family: h_i(x) = (a_i·x + b_i) mod P over a
    * base hash reduced mod P. One md5 per shingle total — the k
    * independent functions are integer mixes of the shared base hash,
    * not k separate cryptographic passes (4-10× cheaper at scale, same
    * MinHash guarantees). Constants are small enough that a·x stays
    * below 2^62 (no ANSI overflow).
    */
  val MinHashP = 2147483647L
  def minHashA(i: Int): Long = 4097L * i + 1
  def minHashB(i: Int): Long = 7919L * i + 3

  /** MinHash signature: k universal hashes minimized over the document's
    * word 3-shingles. Adds columns mh0..mh{k-1} plus `mh_ok` — true iff
    * the doc produced at least one shingle (all mh components non-null).
    */
  def withMinHash(df: DataFrame, textCol: String, k: Int): DataFrame = {
    // Stage each intermediate as a real column: tokens → shingles →
    // base hashes. Expressions nested inside HOF lambdas get no CSE,
    // so an unstaged pipeline re-splits the text per shingle index.
    val staged = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__bh",
        transform(TextOps.shinglesFromTokens(col("__toks"), 3),
          sh => TextOps.hash15(sh) % MinHashP))
      // Validity flag: a 3-shingle exists iff the doc has >= 3 tokens,
      // so mh_ok ⇔ every mh_i below is non-null. It is DELIBERATELY
      // re-derived from the raw text (one cheap split pass) rather than
      // written as isnotnull(mh_i) or size(__bh) > 0: a downstream
      // filter on either of those is predicate-pushed below these
      // projects with the aliased minhash tree INLINED into the filter,
      // re-evaluating the md5-per-shingle pipeline per row — measured
      // 40× on d3 (0.7 s → 32 s at sf0.1) for the isnotnull form and
      // 10× for size(__bh). The token-count form inlines to a single
      // codegen'd split at the scan.
      .withColumn("mh_ok", size(TextOps.tokens(col(textCol))) >= 3)
    val out = (0 until k).foldLeft(staged) { (acc, i) =>
      acc.withColumn(s"mh$i",
        array_min(transform(col("__bh"),
          h => (lit(minHashA(i)) * h + lit(minHashB(i))) % MinHashP)))
    }
    out.drop("__toks", "__bh")
  }

  /** Banded LSH over a MinHash signature: bands of `rowsPerBand`
    * signature components are hashed to a bucket id. Two docs are
    * candidates iff they share (band, bucket) for any band.
    * Returns (idCol, band, bucket) in long form — the natural shuffle
    * key for the candidate join.
    *
    * Documents too short to produce any shingle have all-NULL signature
    * components and are excluded: `concat_ws` SKIPS nulls, so without
    * the filter every short doc would collapse into the hash("") bucket
    * and the candidate join would go quadratic on that one bucket at
    * scale — while a NULL-propagating engine (the oracle's `||`) never
    * joins them at all. Shingle-less docs are not LSH-bucketable; exact
    * dedup (d1) still covers them.
    */
  def lshBuckets(sig: DataFrame, idCol: String, k: Int,
      rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).cast("long").as("band"),
        TextOps.hash15(concat_ws(",", cols: _*)).as("bucket"))
    }
    // Prefer the cheap staged validity flag (see withMinHash); the
    // isNotNull fallback is semantically identical but forces k extra
    // evaluations of the signature pipeline through predicate pushdown.
    val valid =
      if (sig.columns.contains("mh_ok")) col("mh_ok")
      else (0 until k).map(i => col(s"mh$i").isNotNull).reduce(_ && _)
    sig.filter(valid)
      .select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from LSH buckets: ids sharing any (band, bucket),
    * deduplicated across bands, ordered a < b.
    */
  def lshCandidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col(idCol).as("a"), col("band"), col("bucket"))
    val b = buckets.select(col(idCol).as("b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Per-token 60-bit hashes — the staging column for [[simHash]]. */
  def tokenHashes(textCol: String): Column =
    expr(s"transform(split(trim($textCol), '\\\\s+'), t -> " +
      s"cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))")

  /** SimHash over a STAGED token-hash array column (see [[tokenHashes]]),
    * `bits` wide (production would use 64; oracle-checked tests use 16 to
    * keep the generated expression small). Bit j of the result is set iff
    * the majority of token hashes have bit j set.
    *
    * The hash array must be a real column: each bit term references it
    * twice (filter + size), so an inline expression would be re-hashed
    * 2×bits times per row (measured 10× on d6 at sf0.1).
    */
  def simHash(hashesCol: String, bits: Int): Column = {
    val terms = (0 until bits).map { j =>
      s"(CASE WHEN 2 * size(filter($hashesCol, h -> shiftright(h, $j) % 2 = 1))" +
        s" > size($hashesCol) THEN ${1L << j}L ELSE 0L END)"
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  /** n-gram Jaccard similarity between two prepared distinct n-gram set
    * columns: |A∩B| / |A∪B|.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    inter / union.cast("double")
  }

  /** Duplicate-cluster resolution: connected components of the LSH
    * candidate-pair graph by iterative min-label propagation — every doc
    * maps to the smallest doc id reachable through candidate pairs
    * (pairless docs map to themselves). This is the step that turns
    * pairwise candidates into dedup groups with one survivor per
    * cluster.
    *
    * Each iteration is two hash joins + an aggregation, all keyed on
    * doc id; the loop runs to the fixpoint (component diameter
    * iterations — candidate graphs are near-clique per duplicate group,
    * so diameter is small). The driver-side convergence check is one
    * count per iteration. At 100 TB with adversarial chains you would
    * switch to the alternating large-star/small-star algorithm
    * (same join shapes, O(log n) rounds); min-propagation is the right
    * tool for bounded near-clique candidate graphs.
    */
  def duplicateClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    // Only docs with at least one candidate edge can change label —
    // propagate over the connected subgraph (≤ 2·|pairs| rows, usually
    // a tiny fraction of the corpus) and union the untouched identity
    // mapping back at the end.
    val connected = edges.select(col("a").as(idCol)).distinct()
    // `cached` is the persisted frontier; each round carries prev_id so
    // convergence is a filter over the new cache, not a lineage
    // self-join against the frame being replaced.
    var cached = connected
      .withColumn("prev_id", col(idCol))
      .withColumn("cluster_id", col(idCol)).persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val labels = cached.select(col(idCol), col("cluster_id"))
      val neighborMin = edges
        .join(labels, edges("b") === labels(idCol))
        .groupBy(col("a")).agg(min(col("cluster_id")).as("nmin"))
      val next = labels.join(neighborMin,
          labels(idCol) === neighborMin("a"), "left")
        .select(labels(idCol), col("cluster_id").as("prev_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
            .as("cluster_id"))
        .persist()
      val changed =
        next.filter(col("cluster_id") =!= col("prev_id")).count()
      cached.unpersist()
      cached = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // Returning labels from a non-fixpoint would silently split real
    // clusters (and hash-mismatch the oracle's exact closure) — fail
    // loudly instead; diameter-50+ chains need large-star/small-star.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not reach the fixpoint in $maxIter " +
          "iterations (candidate-graph diameter too large); raise " +
          "maxIter or switch to large-star/small-star")
    val resolved = cached.select(col(idCol), col("cluster_id"))
    // Hand the ONE remaining persist to the caller: the returned frame
    // is itself the persisted one (materialized here), the internal
    // frontier is released, and callers free it with .unpersist().
    val out = docs.select(col(idCol))
      .join(resolved, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .persist()
    out.count()
    cached.unpersist()
    out
  }
}
