package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * The group key is the FULL 128-bit md5 (hex string), not the 60-bit
    * `hash15`: at 10B docs a 60-bit key expects ~n²/2⁶¹ birthday
    * collisions, each of which silently merges two distinct documents
    * and drops one from the corpus. 128 bits puts the expected
    * collision count at ~10⁻²⁰ for any realistic corpus. The wider
    * shuffle key (32 bytes vs 8) is noise next to the text column the
    * aggregation already reads.
    */
  def exactDupGroups(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol),
        md5(TextOps.normalize(col(textCol)).cast("binary"))
          .as("content_fp"))
      // NULL text → NULL fingerprint, and groupBy would collect every
      // null-text doc into ONE "duplicate" group whose survivors
      // filter silently drops all but min(id) — routine scraped-data
      // nulls are not duplicates of each other; they carry no content
      // to match on and stay out of the dup groups entirely
      .where(col("content_fp").isNotNull)
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
    // reserved-name guard (the PackOps/SourceMix convention): the
    // working columns would silently OVERWRITE caller columns — and
    // worse, re-signing an already-signed frame with a smaller k
    // would overwrite mh0..mh{k-1} while leaving the old run's higher
    // mh columns stranded, so a later lshBuckets over the original k
    // would mix two signature schemes into corrupt buckets
    val reserved = df.columns.filter(c =>
      c == "__toks" || c == "__bh" || c == "mh_ok" ||
        c.matches("mh\\d+"))
    require(reserved.isEmpty,
      s"withMinHash: input already carries signature/working " +
        s"columns ${reserved.mkString(", ")} — drop them first " +
        "(re-signing a signed frame mixes signature schemes)")
    // Stage each intermediate as a real column: tokens → shingles →
    // base hashes. Expressions nested inside HOF lambdas get no CSE,
    // so an unstaged pipeline re-splits the text per shingle index.
    val staged = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      // native shingle_hashes: the composed transform ran the
      // md5/conv pipeline as an interpreted lambda per shingle
      .withColumn("__bh",
        expr(s"shingle_hashes(__toks, 3, $MinHashP)"))
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
    // ONE select for all k signature columns: a k-step withColumn
    // fold re-analyzes the growing plan each step (quadratic driver
    // work at production signature widths of 100-200 hashes)
    val out = staged.select(staged.columns.toIndexedSeq.map(col) ++
      (0 until k).map(i =>
        array_min(transform(col("__bh"),
          h => (lit(minHashA(i)) * h + lit(minHashB(i))) % MinHashP))
          .as(s"mh$i")): _*)
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

  /** Per-token 60-bit hashes — the staging column for [[simHash]].
    * Native: a 1-shingle is the token itself, so this is
    * `shingle_hashes(toks, 1, 0)` (no modulus) — one JVM pass instead
    * of an interpreted md5 lambda per token.
    */
  def tokenHashes(textCol: String): Column =
    // TextOps.tokens IS the engine's one named tokenizer (WsClass,
    // Column API — see its \f-escape rationale): simhash must hash
    // the same token stream minhash/shingling read, so route through
    // it rather than re-spelling the split here
    call_function("shingle_hashes",
      TextOps.tokens(col(textCol)), lit(1), lit(0L))

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
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    // two EMPTY sets have union 0 — under ANSI (this project's mode)
    // the division would throw DIVIDE_BY_ZERO and kill the whole
    // verification job on one degenerate pair (empty docs are
    // routine in a web corpus); define jaccard(∅, ∅) = 0: no shared
    // content, not a duplicate
    when(union === 0, lit(0.0))
      .otherwise(inter.cast("double") / union.cast("double"))
  }

  /** Lineage-truncation strategy for the iterative fixpoint loops,
    * config-switched per session:
    *
    *  - default: `localCheckpoint(eager = true)` — materialized blocks
    *    live in executor storage; right for single-JVM / gate scale,
    *    but the blocks die with their executor, so a lost executor
    *    kills a long fixpoint run on a real cluster.
    *  - `graft.checkpoint.dir` set: reliable `checkpoint(eager = true)`
    *    into that directory (HDFS/object store on a cluster) — iterate
    *    files survive executor loss, at the cost of a write+read per
    *    round.
    *
    * Either way, [[release]] frees a superseded iterate
    * DETERMINISTICALLY: dropping the reference alone leaves blocks in
    * the BlockManager (and checkpoint files on disk) until a driver GC
    * triggers the ContextCleaner — on a long fixpoint run that
    * accumulates every round's frontier (measured driver OOM, see
    * NOTES.md). The checkpointed frame's plan is a LogicalRDD leaf:
    * unpersist its RDD, and in reliable mode also delete its
    * checkpoint files — safe because release is only called once no
    * later round can reference the iterate.
    */
  private[operators] final class Checkpointer(spark: SparkSession) {
    private val reliableDir = spark.conf.getOption("graft.checkpoint.dir")
    reliableDir.foreach { d =>
      // getCheckpointDir returns "<dir>/<random-UUID>", so equality
      // against the raw configured string is never true. The
      // idempotence check compares the configured path against the
      // PARENT of the current checkpoint dir, path-qualified — a
      // substring test would wrongly treat a RECONFIGURED dir that
      // happens to be a prefix of the old one (".../ckpt" after
      // ".../ckpt-old") as already set and silently keep
      // checkpointing into the old location.
      val dp = new org.apache.hadoop.fs.Path(d)
      val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val want = fs.makeQualified(dp)
      val have = spark.sparkContext.getCheckpointDir.flatMap(c =>
        Option(new org.apache.hadoop.fs.Path(c).getParent))
      if (!have.exists(h => fs.makeQualified(h) == want))
        spark.sparkContext.setCheckpointDir(d)
    }

    def truncate(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)

    def release(df: DataFrame): Unit = releaseCheckpointLeaf(df)
  }

  /** Shared release body for a checkpointed LogicalRDD leaf: unpersist
    * the blocks and delete reliable-checkpoint files (getCheckpointFile
    * is None under localCheckpoint, so the delete is a no-op there).
    * One implementation for both the per-round iterate release and the
    * caller-facing [[free]] — the two must never drift.
    */
  private def releaseCheckpointLeaf(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(path, true)
        }
      case _ => df.unpersist()
    }

  /** Bucket-local minimum labels: for each doc, the smallest doc id
    * sharing ANY of its (band, bucket) LSH buckets — exactly the
    * neighbor-min a first min-propagation round would compute, but as
    * two aggregations over the bucket frame instead of an edge
    * self-join + join + aggregation. Used to SEED
    * [[duplicateClusters]]: LSH candidate graphs are near-clique per
    * duplicate group (often one bucket = one whole cluster), so the
    * seed is frequently already the fixpoint and the loop only pays
    * its confirming round. Returns `(idCol, cluster_id)`.
    */
  def bucketLocalMin(buckets: DataFrame, idCol: String): DataFrame = {
    val gmin = buckets.groupBy(col("band"), col("bucket"))
      .agg(min(col(idCol)).as("gmin"))
    buckets.join(gmin, Seq("band", "bucket"))
      .groupBy(col(idCol))
      .agg(min(col("gmin")).as("cluster_id"))
  }

  /** Iteration count of the most recent [[duplicateClusters]] run —
    * instrumentation for specs and ScaleProbe (the seeded-start
    * round-count claim is measured, not asserted). Thread-local would
    * be overkill: the builders run one loop at a time.
    */
  @volatile private[graft] var lastIterations: Int = 0

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
    *
    * `initLabels` (optional, `(idCol, cluster_id)`) seeds the loop with
    * precomputed labels — e.g. [[bucketLocalMin]], which unrolls the
    * first propagation round into two cheap aggregations. Contract:
    * every seed label must be the id of a node in the SAME component
    * (a neighborhood min satisfies this); docs absent from the seed
    * start at identity. The fixpoint — and therefore the result — is
    * unchanged by seeding (spec-asserted); only the round count drops.
    */
  def duplicateClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String, maxIter: Int = 50,
      initLabels: Option[DataFrame] = None): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    // Only docs with at least one candidate edge can change label —
    // propagate over the connected subgraph (≤ 2·|pairs| rows, usually
    // a tiny fraction of the corpus) and union the untouched identity
    // mapping back at the end.
    val connected = edges.select(col("a").as(idCol)).distinct()
    // `cached` is the materialized frontier. Each round must TRUNCATE
    // lineage, not merely persist: the iterate is referenced twice per
    // round (neighbor-min + carry join), and analyzer transforms copy
    // shared subtrees, so an un-truncated plan DOUBLES per round —
    // measured driver OOM (8g) at ~10 rounds on a 61-edge chain.
    // Checkpointer.truncate materializes the rows and replaces the plan
    // with a constant-size leaf (localCheckpoint by default, a reliable
    // checkpoint dir when graft.checkpoint.dir is set — the cluster
    // deployment mode, since localCheckpoint blocks die with their
    // executor); superseded iterates are released deterministically.
    // Each round carries prev_id so convergence is a filter over the
    // new iterate, not a self-join against the frame being replaced.
    val ckpt = new Checkpointer(docs.sparkSession)
    val start = initLabels match {
      case Some(init) => connected
        .join(init.select(col(idCol), col("cluster_id").as("__seed")),
          Seq(idCol), "left")
        .select(col(idCol), col(idCol).as("prev_id"),
          coalesce(col("__seed"), col(idCol)).as("cluster_id"))
      case None => connected
        .withColumn("prev_id", col(idCol))
        .withColumn("cluster_id", col(idCol))
    }
    var cached = ckpt.truncate(start)
    // try/finally: a mid-loop job failure (executor loss during a
    // truncate or the convergence count) must not leak the persisted
    // edges RDD or the live iterate's checkpoint — in reliable mode
    // those are PERMANENT rdd-N directories (the ContextCleaner does
    // not delete reliable checkpoints), the exact leak class the
    // non-convergence path already guarded while the exception path
    // did not
    try {
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val labels = cached.select(col(idCol), col("cluster_id"))
        val neighborMin = edges
          .join(labels, edges("b") === labels(idCol))
          .groupBy(col("a")).agg(min(col("cluster_id")).as("nmin"))
        val next = ckpt.truncate(labels.join(neighborMin,
            labels(idCol) === neighborMin("a"), "left")
          .select(labels(idCol), col("cluster_id").as("prev_id"),
            least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
              .as("cluster_id")))
        val changed =
          next.filter(col("cluster_id") =!= col("prev_id")).count()
        ckpt.release(cached)
        cached = next
        converged = changed == 0
        iter += 1
      }
      lastIterations = iter
      // Returning labels from a non-fixpoint would silently split real
      // clusters (and hash-mismatch the oracle's exact closure) — fail
      // loudly instead; diameter-50+ chains need large-star/small-star.
      if (!converged)
        throw new IllegalStateException(
          s"duplicateClusters did not reach the fixpoint in $maxIter " +
            "iterations (candidate-graph diameter too large); raise " +
            "maxIter or switch to large-star/small-star")
      val resolved = cached.select(col(idCol), col("cluster_id"))
      // The result is TRUNCATED through the checkpointer (a
      // materialized LogicalRDD leaf), not merely persisted: a
      // persisted frame keeps its lineage, so once the final
      // iterate's checkpoint is released below, losing a block of the
      // result on a cluster would recompute through deleted
      // checkpoint data. Truncating first makes the result
      // self-contained; only then is the iterate released (by the
      // finally). Callers free the result deterministically with
      // [[free]] (`.unpersist()` on it is a harmless no-op — the
      // ContextCleaner reclaims the blocks after the reference drops).
      ckpt.truncate(docs.select(col(idCol))
        .join(resolved, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("cluster_id"), col(idCol)).as("cluster_id")))
    } finally {
      edges.unpersist()
      ckpt.release(cached)
    }
  }

  /** Deterministically release a frame returned by [[duplicateClusters]]
    * / [[duplicateClustersStar]]: unpersists the materialized blocks and
    * deletes reliable-checkpoint files if the session ran with
    * `graft.checkpoint.dir`.
    *
    * Skipping it is safe only in the default localCheckpoint mode
    * (blocks are reclaimed by the ContextCleaner after the reference
    * drops). In RELIABLE mode the ContextCleaner does NOT delete
    * checkpoint files unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (Spark
    * default false), so a reliable-mode driver that never frees its
    * results leaks one rdd-N directory per loop run on the checkpoint
    * store — call free() once the result is consumed (ScaleOpsSpec
    * pins that it really deletes the directory).
    */
  def free(result: DataFrame): Unit = releaseCheckpointLeaf(result)

  /** Connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the scale path [[duplicateClusters]]'s doc points to:
    * min-label propagation needs component-DIAMETER rounds (a pathological
    * duplicate chain of length 10k is 10k joins), large/small-star
    * converges in O(log n) rounds on any graph shape.
    *
    * large-star points every neighbor LARGER than u at u's neighborhood
    * min (long chains collapse toward the root from everywhere at once);
    * small-star re-points u and its smaller neighbors at that min. Both
    * are one groupBy + one equi-join on node id — the same shuffle shape
    * as one min-propagation round — and the edge set only shrinks toward
    * the final star, so rounds get cheaper as they go. Same contract as
    * [[duplicateClusters]]: every doc id maps to the smallest id in its
    * component; the returned frame is a materialized checkpoint leaf,
    * released with [[free]].
    */
  def duplicateClustersStar(docs: DataFrame, pairs: DataFrame,
      idCol: String, maxRounds: Int = 25): DataFrame = {
    // One star step over the CANONICAL (lo < hi) edge set: group the
    // bidirectional adjacency by node, attach each node's neighborhood
    // min m = min(N(u) ∪ {u}), emit (v, m) for the step's v-selection,
    // re-canonicalize. Self-loops drop; distinct keeps the set small.
    def step(canon: DataFrame, large: Boolean): DataFrame = {
      val adj = canon.select(col("a"), col("b"))
        .union(canon.select(col("b").as("a"), col("a").as("b")))
      val m = adj.groupBy(col("a")).agg(min(col("b")).as("nmin"))
        .select(col("a"), least(col("nmin"), col("a")).as("m"))
      val emitted =
        if (large)
          // neighbors v > u re-point at m(u)
          adj.filter(col("b") > col("a")).join(m, Seq("a"))
            .select(col("b").as("x"), col("m").as("y"))
        else
          // u itself and neighbors v <= u re-point at m(u)
          adj.filter(col("b") <= col("a")).join(m, Seq("a"))
            .select(col("b").as("x"), col("m").as("y"))
            .union(m.select(col("a").as("x"), col("m").as("y")))
      emitted.filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct()
    }
    // Convergence = canonical edge set unchanged over a full round,
    // checked by (count, order-independent XOR of edge hashes) — one
    // aggregation, no except-shuffle. XOR (not sum: ANSI long overflow)
    // is exact on a distinct edge set; two 64-bit folds make a false
    // "converged" collision negligible, and the spec cross-checks the
    // labels against min-propagation output.
    def sig(canon: DataFrame): (Long, Long, Long) = {
      val r = canon.agg(count(lit(1)),
        expr("bit_xor(xxhash64(a, b))"),
        expr("bit_xor(xxhash64(b, a))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    // Checkpointer per round for the same reason as in
    // [[duplicateClusters]]: each step references the iterate several
    // times (adjacency union + neighborhood-min join), so an
    // un-truncated plan grows exponentially with rounds.
    val ckpt = new Checkpointer(docs.sparkSession)
    var canon = ckpt.truncate(pairs
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    // try/finally: same exception-path leak guard as
    // [[duplicateClusters]] — a mid-round job failure must release the
    // live iterate's (possibly reliable, hence permanent) checkpoint
    val out = try {
      var prevSig = sig(canon)
      var round = 0
      var converged = canon.isEmpty
      while (!converged && round < maxRounds) {
        val next = ckpt.truncate(step(step(canon, large = true),
          large = false))
        val nextSig = sig(next)
        ckpt.release(canon)
        canon = next
        converged = nextSig == prevSig
        prevSig = nextSig
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"duplicateClustersStar did not converge in $maxRounds rounds")
      // At the fixpoint the graph is a union of stars rooted at
      // component minima: every node's label is min(self, neighbors).
      val labels = canon.select(col("a"), col("b"))
        .union(canon.select(col("b").as("a"), col("a").as("b")))
        .groupBy(col("a")).agg(min(col("b")).as("nmin"))
        .select(col("a").as(idCol),
          least(col("nmin"), col("a")).as("cluster_id"))
      // Same lifetime discipline as [[duplicateClusters]]: truncate the
      // result to a self-contained leaf BEFORE releasing the final edge
      // set its plan references (the finally releases it); free with
      // [[free]].
      ckpt.truncate(docs.select(col(idCol))
        .join(labels, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("cluster_id"), col(idCol)).as("cluster_id")))
    } finally ckpt.release(canon)
    out
  }
}
