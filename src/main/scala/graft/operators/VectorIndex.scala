package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The IVF+PQ index as a PERSISTED ARTIFACT — the build-once/serve-many
  * lifecycle a trained index actually has in production, instead of the
  * retrain-per-query shape of the inline demos (s4/s8/s9 train on every
  * invocation, which is right for a gate and wrong for a service).
  *
  * Artifact layout under `dir/`:
  *  - `centroids/`  (cell, cvec array<double>, cn) — the trained coarse
  *    quantizer, k rows (dim-sized; collected to the driver on load).
  *  - `codebooks/`  (j, c, m array<double>) — the PQ codebooks,
  *    subspaces×k rows (dim-sized).
  *  - `corpus/`     (vec_id, embedding, n, code) PARTITIONED BY cell —
  *    the encoded corpus laid out as on-disk inverted lists: a serving
  *    query's cell filter becomes a partition filter, so a probe reads
  *    ONLY its cells' files. At 100 TB this directory layout IS the
  *    FAISS IVF-list topology expressed in parquet partitioning, and
  *    the build is one distributed write.
  *
  * Determinism: training is the same integer-exact scheme as the
  * inline queries (shared builders), and parquet round-trips
  * float/double/int values bit-exactly, so build → load → serve equals
  * train → serve EXACTLY (spec-asserted against s8, and s11's oracle
  * is literally s8's oracle).
  */
object VectorIndex {

  final case class Loaded(cents: SimilarityOps.IvfCentroids,
      books: ProductQuantization.Codebooks, corpus: DataFrame,
      gateBits: Option[Int] = None)

  /** The artifact's serving-gate geometry stamp (`dir/gate`, one
    * `bits` row): present iff the corpus carries a persisted `bucket`
    * column computed as `signBucket(embedding, bits)`. The ingest
    * gate requires the stamp to MATCH its requested bits (a mismatch
    * fails loudly — a stale bucket column under different geometry
    * would silently miss collisions); artifacts without the stamp
    * (built before the column existed, or with `gateBits = None`)
    * derive the bucket on the fly.
    */
  def gateBitsOf(s: SparkSession, dir: String): Option[Int] = {
    import s.implicits._
    // the COMMIT MARKER, not bare directory existence: a crash during
    // the stamp write leaves a half-written directory (no _SUCCESS),
    // and reading it would throw — wedging every later load() of an
    // otherwise healthy artifact. Absent marker = no stamp = the gate
    // derives on the fly, which is always correct.
    val p = new org.apache.hadoop.fs.Path(s"$dir/gate/_SUCCESS")
    if (!p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p))
      None
    else Some(s.read.parquet(s"$dir/gate").select("bits")
      .as[Int].head())
  }

  private def dropGate(s: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/gate")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Train both quantizers on `e0` (vec_id + embedding) and write the
    * artifact. One pass over the corpus for the final encode+write;
    * training jobs touch only integer-exact aggregates.
    *
    * `metaCols` names metadata columns of `e0` to carry INTO the
    * inverted lists (e.g. `label`) — the filtered-serving design
    * (s12): predicate columns live next to the codes so a filtered
    * probe never joins back to the corpus.
    *
    * `gateBits` declares the ingest gate's sign-LSH geometry: when
    * set, each corpus row's `bucket = signBucket(embedding, bits)` is
    * computed INSIDE the encode+write pass and persisted as one more
    * artifact column, stamped via the `dir/gate` file — so the
    * streaming gate reads buckets off disk instead of re-deriving
    * them over the full corpus every micro-batch (the O(corpus)
    * per-batch cost this column exists to delete). Crash ordering:
    * the old stamp is dropped BEFORE the corpus overwrite and the new
    * one written AFTER it, so a stamp never describes a corpus that
    * lacks the column — the gate degrades to derive-on-the-fly, never
    * to wrong buckets.
    */
  def build(e0: DataFrame, dim: Int, lloydSteps: Int, subspaces: Int,
      subDim: Int, k: Int, dir: String,
      metaCols: Seq[String] = Seq.empty,
      gateBits: Option[Int] = None): Unit = {
    // `bucket` is the gate's column: a metadata column with that name
    // would be silently clobbered by the withColumn below (or
    // duplicated in the select when gateBits is set) — refuse at
    // build instead
    require(!metaCols.contains("bucket"),
      "VectorIndex.build: 'bucket' is reserved for the ingest gate's " +
        "sign-bucket column — rename the metadata column")
    val s = e0.sparkSession
    import s.implicits._
    // single-writer per artifact, ENFORCED (the DedupIndex batch
    // mutators' contract): the lease lives at the artifact's SIBLING
    // lock root so rebuild's staging swap never carries it away
    WriterLease.withLease(s, DedupIndex.leaseRoot(dir)) {
    // build makes 5-6 passes over this frame (two quantizer trainings
    // with their seed collects, then the encode+write and the
    // membership sketch) — cost-gated cache so passes 2..n read the
    // materialized copy instead of re-running the scan+norm lineage;
    // released before leaving the build either way
    val e = SimilarityOps.trainCache(
      SimilarityOps.withNorm(e0, "embedding", "n"))
    try {
    // the two quantizer trainings are independent (coarse cells from
    // Lloyd over `e`; PQ codebooks from Lloyd over `e`'s subspaces)
    // and mutate nothing — overlap them so one's driver-side collect/
    // recentroid phase runs under the other's jobs (Par's contract;
    // read-only, so the crash sweeps' mutating-op order is untouched)
    val (cents, books) = Par.both {
      SimilarityOps.trainIvf(e, dim, lloydSteps)
    } {
      ProductQuantization.train(
        e, "embedding", "vec_id", subspaces, subDim, k, steps = 1)
    }
    // heartbeat + fence after the long training stage, BEFORE the
    // first destructive write: a holder whose training outlasted the
    // steal horizon (and was legally stolen) dies here instead of
    // interleaving overwrites with the stealer — the lease's mtime
    // otherwise never moves during a long build
    WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
    // the two quantizer-state writes are independent single-task jobs
    // on disjoint trees — overlap them (each is ~all driver latency).
    // Both are awaited BEFORE the corpus write below, so the crash
    // implication readers rely on is untouched: corpus committed ⇒
    // quantizer state complete (buildOrLoad keys on the corpus
    // marker and load() reads both trees).
    Par.both {
      cents.cells.indices.map(c => (cents.cells(c),
          cents.books.slice(c * dim, (c + 1) * dim).toSeq,
          cents.mns(c)))
        .toDF("cell", "cvec", "cn")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    } {
      books.zipWithIndex.flatMap { case (cbs, j) =>
          cbs.zipWithIndex.map { case (m, c) => (j, c, m.toSeq) } }.toSeq
        .toDF("j", "c", "m")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    }
    val assigned = e.withColumn("cell",
      SimilarityOps.ivfAssign(cents, dim))
    // drift baseline: the training corpus's mean assigned-centroid
    // cosine under the quantizers just trained ON it — the "no drift"
    // reference [[append]] compares each batch against. FOLDED INTO
    // the corpus write via observe(): one broadcast join against the
    // k-row centroid table rides the encode+write job, instead of the
    // extra full-corpus read-back this used to pay (at 100 TB that
    // read-back was a whole second pass per build). A corpus of only
    // zero-norm vectors yields no statistic (avg over all-null) — no
    // baseline file, signal stays off.
    val drift = new org.apache.spark.sql.Observation("drift_base")
    val rows = ProductQuantization.encode(assigned, "embedding", books,
        subDim, "code")
      // left join: the centroid table covers every cell ivfAssign can
      // emit, but corpus rows must survive even if it didn't
      .join(broadcast(centroidTable(s, cents, dim)), Seq("cell"),
        "left")
      .observe(drift, avg(when(col("n") > 0 && col("cn") > 0,
        call_function("vec_dot", col("embedding"), col("cvec")) /
          (col("n") * col("cn")))).as("base_cos"),
        count(lit(1)).as("n_rows"))
      // the serving columns, the gate bucket when stamped, plus any
      // declared filter metadata — other input columns (and the
      // joined centroid columns) don't belong in the index artifact
      .withColumn("bucket", gateBits.fold(lit(null).cast("long"))(b =>
        SimilarityOps.signBucket("embedding", b)))
      .select((Seq("vec_id", "embedding", "n", "cell", "code") ++
        gateBits.map(_ => "bucket").toSeq ++ metaCols).map(col): _*)
      .withColumn("ingest", lit(0L))
    // a re-build drops the previous sketch AND gate stamp BEFORE the
    // corpus overwrite (DedupIndex.buildMembers' crash argument; the
    // stamp must never outlive the bucket column it describes)
    DedupIndex.dropMembers(s, dir)
    dropGate(s, dir)
    // a gate-stamped corpus is laid out bucket-sorted WITHIN each
    // cell's files: row-group min/max stats on `bucket` become tight,
    // so the gate's pushed touched-bucket filter skips row groups
    // instead of scanning every block. The CONSTANT `ingest` key must
    // NOT appear in the sort list: FoldablePropagation prunes it from
    // the Sort, the V1 writer then sees an ordering that no longer
    // carries its required partition prefix and injects its own
    // NON-STABLE sort by the partition columns alone — silently
    // destroying the bucket order (verified empirically on both the
    // static and dynamic overwrite paths; the earlier
    // `(ingest, cell, bucket)` spelling shipped unsorted files).
    gateBits.fold(rows)(_ => rows.sortWithinPartitions(
        col("cell"), col("bucket")))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit",
        DedupIndex.pageRowLimit(s))
      .partitionBy("ingest", "cell")
      .parquet(s"$dir/corpus")
    // fence after the long encode+write stage, before the stamp/
    // manifest/sketch publishes (the build's commit-equivalents)
    WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
    val metrics = drift.get
    // the three commit-side publishes (gate stamp, drift baseline,
    // manifest — kept in that relative order) and the membership
    // sketch build touch four DISJOINT trees and none reads another's
    // output — overlap the sketch (one aggregate job over the cached
    // frame plus its staged save) with the publishes. Every crash
    // window is a combination of each piece's own absent-is-safe
    // contract (no stamp → derive-on-the-fly; no drift baseline →
    // signal off; no manifest → raw-listing fallback; no sketch →
    // unpruned serving), exactly the classes the serial order already
    // had — the one NEW combination, sketch-present/manifest-absent,
    // is safe because the sketch is a superset filter whatever the
    // listing source. The lease-FENCED sketch save stays on the
    // CALLING thread (WriterLease tracks holders per thread — Par's
    // documented rule).
    // live-id membership sketch beside the corpus — same composition
    // (and the same superset/OR/unlearn contract) as
    // [[DedupIndex]]'s; [[memberPrune]] serves it. The sizing count
    // rode the corpus write's Observation — no extra pass. Built from
    // the cached frame (same ids as e0), not the raw input, so the
    // sketch pass is a cache read when the gate engaged.
    Par.both {
      gateBits.foreach(b => Seq(b).toDF("bits")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/gate"))
      metrics.get("base_cos").flatMap(Option(_))
        .foreach(c => Seq(c.asInstanceOf[Double]).toDF("base_cos")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/drift"))
      ArtifactManifest.recordBuild(s, s"$dir/corpus",
        Some(ArtifactManifest.frameShapeJson(rows.schema,
          Seq("ingest", "cell"))))
    } {
      DedupIndex.buildMembers(e, "vec_id", dir,
        metrics.get("n_rows").map(_.asInstanceOf[Long]))
    }
    } finally e.unpersist()
    }
  }

  /** The k-row (cell, cvec, cn) centroid table for the drift dot
    * product — FLOAT centroid copies so it runs through the native
    * codegen'd vec_dot instead of a zip_with/aggregate lambda chain
    * (measured ~2x on the whole-build bench delta); the signal is
    * tolerance-thresholded, so the float rounding is irrelevant.
    */
  private def centroidTable(s: SparkSession,
      cents: SimilarityOps.IvfCentroids, dim: Int): DataFrame = {
    import s.implicits._
    cents.cells.indices.map(c => (cents.cells(c),
        cents.books.slice(c * dim, (c + 1) * dim).map(_.toFloat).toSeq,
        cents.mns(c)))
      .toDF("cell", "cvec", "cn")
  }

  /** The stored drift baseline ([[build]] writes it; artifacts built
    * before the drift signal existed have none).
    */
  def driftBaseline(s: SparkSession, dir: String): Option[Double] = {
    import s.implicits._
    // commit marker, same rationale as [[gateBitsOf]]: a crash during
    // the baseline write must read as "no baseline" (signal off),
    // never wedge append()'s drift check with an unreadable directory
    val p = new org.apache.hadoop.fs.Path(s"$dir/drift/_SUCCESS")
    if (!p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p))
      None
    else Some(s.read.parquet(s"$dir/drift").select("base_cos")
      .as[Double].head())
  }

  /** Deterministic artifact root for build-or-load serving: keyed by
    * the dataset's canonical path plus a cheap CONTENT fingerprint
    * (every file's relative path, length, and mtime — one driver-side
    * metadata walk, no data read), and a caller tag that must encode
    * the index geometry — so two datasets, two geometries, or two
    * GENERATIONS of the same dataset path never share an artifact.
    * Regenerating the dataset in place (as the test-data driver does
    * between rounds) therefore changes the root and the next
    * buildOrLoad builds fresh instead of silently serving a stale
    * index. Lives under the JVM temp dir here; at cluster scale this
    * is a shared-filesystem path provisioned by the platform, and the
    * fingerprint walk is one filesystem listing of the dataset dir.
    * Within one fingerprint the artifact still follows the index
    * lifecycle (append / rebuild policy), not cache invalidation.
    */
  def artifactRoot(tag: String, datasetDir: String): String = {
    // canonicalize BEFORE walking so two spellings of the same
    // dataset dir (trailing dot, symlinked root) produce one key,
    // not duplicate artifacts; children are recorded RELATIVE to the
    // root (as documented — two identical copies at different mounts
    // still key differently only via the root line). A child listing
    // that races a concurrent delete (listFiles -> null) contributes
    // nothing rather than NPE-ing, and symlinked DIRECTORIES are
    // fingerprinted as links, not followed — following would let a
    // self- or ancestor-pointing link recurse forever.
    val root = new java.io.File(datasetDir).getCanonicalFile
    val prefix = root.getPath + java.io.File.separator
    def walk(f: java.io.File): Seq[String] = {
      val rel = f.getPath.stripPrefix(prefix)
      if (java.nio.file.Files.isSymbolicLink(f.toPath))
        Seq(s"$rel:link:${java.nio.file.Files.readSymbolicLink(f.toPath)}")
      else if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(s"$rel:${f.length}:${f.lastModified}")
    }
    def md5(s: String): String = ArtifactManifest.md5(s)
    // the root name carries TWO keys: the dataset PATH key (which
    // dataset) and the CONTENT key (which generation of it). A
    // regeneration changes only the content key — the previous
    // generation's root under the same (tag, path) is then garbage
    // by construction (nothing can ever resolve it again), and is
    // pruned here so fingerprint-keyed roots don't accumulate one
    // abandoned index per regeneration. Roots of OTHER datasets
    // sharing the tag (different path key) are never touched. Same
    // single-writer contract as every artifact mutation.
    val pathKey = md5(root.getPath).take(8)
    val contentKey = md5(walk(root).mkString("\n")).take(16)
    val parent = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-artifacts")
    val name = s"$tag-$pathKey-$contentKey"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .foreach(rm)
      f.delete()
    }
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith(s"$tag-$pathKey-") &&
        f.getName != name)
      .foreach(rm)
    s"${parent.getPath}/$name"
  }

  /** Build the artifact only if absent (detected by the corpus write's
    * commit marker), then load — the serve-many entry point: the first
    * call pays training + encode, every later call pays only the
    * dim-sized quantizer load. Same single-writer-per-root contract as
    * [[append]].
    */
  def buildOrLoad(e0: DataFrame, dim: Int, lloydSteps: Int,
      subspaces: Int, subDim: Int, k: Int, dir: String,
      metaCols: Seq[String] = Seq.empty,
      gateBits: Option[Int] = None): Loaded = {
    val s = e0.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$dir/corpus/_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      build(e0, dim, lloydSteps, subspaces, subDim, k, dir, metaCols,
        gateBits)
    load(s, dir)
  }

  /** Incremental ingest — the lifecycle's second half (build once,
    * APPEND forever, retrain only when drift demands it): encode the
    * new vectors under the artifact's FROZEN quantizers and append
    * them into the cell-partitioned corpus. One distributed job;
    * dynamic-partition append touches only the new rows' files, so
    * existing inverted lists are never rewritten and a 100 TB index
    * absorbs a batch of arrivals at the cost of encoding that batch.
    * Frozen-quantizer encoding is the standard index practice (FAISS
    * `add` after `train`); recall drifts only as the data
    * distribution leaves the training sample — the s6-style recall
    * gate is the re-train trigger.
    *
    * MAINTENANCE is wired in (the text twin's contract,
    * [[DedupIndex.append]]): at `compactEvery` accumulated
    * generations the append triggers
    * [[ArtifactManifest.compactGenerations]], collapsing the per-batch cell
    * files back to one file per cell — a serving probe of one cell
    * opens a bounded file count at any ingest rate. Serve results are
    * identical across the collapse (spec-asserted).
    *
    * Returns the DRIFT SIGNAL — `true` when this batch's mean
    * assigned-centroid cosine fell more than `driftTolerance` below
    * the artifact's stored training baseline, i.e. the arriving
    * distribution has left the training sample and frozen-quantizer
    * encoding is costing recall: the caller's cue to schedule
    * [[rebuild]], mirroring how `compactEvery` schedules compaction
    * (rebuild is NOT triggered automatically — it is a maintenance
    * window op under the single-writer contract, and one drifted
    * batch amid normal traffic shouldn't force a full retrain; the
    * caller decides, e.g. after N consecutive `true`s). The statistic
    * costs one batch-sized aggregate against the k-row broadcast
    * centroid table — never a corpus scan, so a 100 TB index pays
    * per-batch cost only. Artifacts built before the baseline existed
    * always return `false`.
    */
  def append(s: SparkSession, dir: String, newVecs: DataFrame,
      compactEvery: Int = 16,
      driftTolerance: Double = 0.05): Boolean = {
    require(compactEvery >= 2,
      s"append: compactEvery >= 2 (got $compactEvery)")
    require(driftTolerance > 0.0,
      s"append: driftTolerance > 0 (got $driftTolerance)")
    WriterLease.withLease(s, DedupIndex.leaseRoot(dir)) {
    val l = load(s, dir)
    val gen = DedupIndex.nextGeneration(s, s"$dir/corpus")
    // the batch's drift statistic RIDES the append write as an
    // Observation (one broadcast join against the k-row centroid
    // table inside the encode+write job) — the old form read the
    // written generation BACK for a separate aggregate, one extra
    // driver action + scan per append. The baseline read is
    // independent of the append (disjoint trees; read-only) and
    // overlaps it; the lease-fenced write stays on the calling
    // thread (Par's rule).
    val (base, cos) = Par.both {
      driftBaseline(s, dir)
    } {
      appendWithDrift(l, dir, newVecs, gen)
    }
    val tripped =
      base.exists(b => cos.exists(_ < b - driftTolerance))
    if (LayoutOps.ingestGenerations(s, s"$dir/corpus")
        .size >= compactEvery)
      // SIZED: a cell past graft.index.targetFileBytes range-splits
      // its files on bucket (gate-stamped artifacts) so the pushed
      // probes keep skipping; ungated corpora split by hash
      ArtifactManifest.compactGenerationsSized(s, s"$dir/corpus",
        "cell", sortWithin = l.gateBits.map(_ => "bucket").toSeq)
    tripped
    }
  }

  /** Append one ingest GENERATION under an already-loaded artifact —
    * the ingest-loop fast path (quantizers are frozen, so a stream
    * collects them once, not per batch; only `l.corpus`'s column list
    * is consulted here). The generation is a partition column and the
    * write is a DYNAMIC partition overwrite, so a replayed
    * micro-batch replaces its own partitions instead of
    * double-appending — per-batch ingest is idempotent. Same
    * SINGLE-WRITER contract as [[DedupIndex.appendWith]]: generation
    * assignment is uncoordinated, so run one ingest writer per
    * artifact.
    */
  def appendWith(l: Loaded, dir: String, newVecs: DataFrame,
      generation: Long): Unit = {
    appendWithDrift(l, dir, newVecs, generation)
    ()
  }

  /** [[appendWith]] plus the batch's mean assigned-centroid cosine —
    * the drift statistic — observed ON the append write (one
    * broadcast join against the k-row centroid table rides the
    * encode+write job, the same fold [[build]] uses for the
    * baseline), instead of [[append]]'s former read-back aggregate of
    * the just-written generation. `None` when no batch row has a
    * positive norm (including the zero-row batch).
    */
  private[operators] def appendWithDrift(l: Loaded, dir: String,
      newVecs: DataFrame, generation: Long): Option[Double] = {
    val dim = l.cents.books.length / l.cents.cells.length
    val subDim = l.books.head.head.length
    val ss = newVecs.sparkSession
    // the artifact's metadata columns (anything beyond the serving
    // five, the stamped gate bucket, and the generation) must arrive
    // with the new vectors too
    val metaCols = l.corpus.columns.toSeq
      .filterNot(Set("vec_id", "embedding", "n", "cell", "code",
        "bucket", "ingest"))
    // membership before the corpus append (superset-on-crash)
    DedupIndex.orMembers(newVecs, "vec_id", dir)
    val drift = new org.apache.spark.sql.Observation
    val rows = ProductQuantization.encode(
        SimilarityOps.withNorm(newVecs, "embedding", "n")
          .withColumn("cell", SimilarityOps.ivfAssign(l.cents, dim)),
        "embedding", l.books, subDim, "code")
      // left join, zero-norm rows excluded from the statistic —
      // build's drift-baseline fold verbatim
      .join(broadcast(centroidTable(ss, l.cents, dim)), Seq("cell"),
        "left")
      .observe(drift, avg(when(col("n") > 0 && col("cn") > 0,
        call_function("vec_dot", col("embedding"), col("cvec")) /
          (col("n") * col("cn")))).as("batch_cos"))
      // a gate-stamped artifact keeps its bucket column CONSISTENT
      // across appends: the batch's buckets are computed under the
      // stamped geometry inside the same encode pass
      .withColumn("bucket", l.gateBits.fold(lit(null).cast("long"))(
        b => SimilarityOps.signBucket("embedding", b)))
      .select((Seq("vec_id", "embedding", "n", "cell", "code") ++
        l.gateBits.map(_ => "bucket").toSeq ++ metaCols).map(col): _*)
      .withColumn("ingest", lit(generation))
    // pre-write fence: a batch-mutator holder that stalled past the
    // steal horizon refuses before touching the corpus (no-op on the
    // lease-less streaming fast path — run-private roots)
    WriterLease.verifyHeld(newVecs.sparkSession,
      DedupIndex.leaseRoot(dir))
    // bucket-sorted layout within the generation's cell files, same
    // as [[build]] — keeps the gate's row-group skipping effective
    // across appends (constant `ingest` out of the sort list — see
    // build's layout comment)
    l.gateBits.fold(rows)(_ => rows.sortWithinPartitions(
        col("cell"), col("bucket")))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.page.row.count.limit",
        DedupIndex.pageRowLimit(newVecs.sparkSession))
      .partitionBy("ingest", "cell").parquet(s"$dir/corpus")
    ArtifactManifest.recordAppend(newVecs.sparkSession,
      s"$dir/corpus", generation, Some(ArtifactManifest.frameShapeJson(rows.schema,
        Seq("ingest", "cell"))))
    drift.get.get("batch_cos").flatMap(Option(_))
      .map(_.asInstanceOf[Double])
  }

  /** Retrain the artifact's quantizers on its CURRENT contents — the
    * drift response (the s6-style recall gate is the documented
    * re-train trigger; this is the op it triggers): appended batches
    * encode under frozen, possibly-stale quantizers, and when the
    * data distribution has left the training sample, recall decays
    * until a rebuild re-trains on what the index NOW holds. Trains
    * into a staging sibling and swaps by rename (the corpus being
    * read is never the tree being written), preserving the artifact's
    * metadata columns; the rebuild starts a new generation epoch
    * (everything re-encodes as ingest=0). Training is id-seeded and
    * integer-exact, so rebuild(artifact) ≡ build(its rows) EXACTLY —
    * the oracle-gated contract (s16): build-stale → append → rebuild
    * serves what full-corpus training serves. The swap is
    * [[LayoutOps.swapInto]] (live aside → staging in → old deleted),
    * so the artifact path is never the only missing copy. Same
    * single-writer maintenance-window contract as compaction.
    */
  def rebuild(s: SparkSession, dir: String, lloydSteps: Int,
      subspaces: Int, subDim: Int, k: Int): Unit =
    WriterLease.withLease(s, DedupIndex.leaseRoot(dir)) {
    // complete a crashed staged takedown before training: the rebuild
    // must train on post-takedown content, and the swap below would
    // otherwise strand the marked staging tree for a later recovery
    // to wrongly adopt (see LayoutOps.deleteKeysPartitioned)
    LayoutOps.recoverStagedTakedown(s, s"$dir/corpus", "cell")
    val l = load(s, dir)
    val dim = l.cents.books.length / l.cents.cells.length
    // `bucket` is NOT a metadata column: the staging build recomputes
    // it under the carried gate stamp (embedding-derived, so the
    // values are identical — but routing it through the stamp keeps
    // exactly one source of truth for the geometry)
    val metaCols = l.corpus.columns.toSeq
      .filterNot(Set("vec_id", "embedding", "n", "cell", "code",
        "bucket", "ingest"))
    // SIBLING, not string concatenation: under a trailing-slash dir
    // the naive concat yields a CHILD of the live tree, which the
    // swap's rename-aside then carries away — stranding the staged
    // rewrite (the hazard LayoutOps.sibling documents)
    val sp = LayoutOps.sibling(dir, "__rebuild")
    val staging = sp.toString
    val dp = new org.apache.hadoop.fs.Path(dir)
    val fs = dp.getFileSystem(s.sparkContext.hadoopConfiguration)
    // fence BEFORE deleting what looks like leftover staging: if our
    // lease was stolen, that staging is the stealer's IN-PROGRESS
    // rebuild, not a crashed pass's residue — deleting it would be
    // exactly the two-writer interleaving the lease exists to prevent
    WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
    fs.delete(sp, true) // leftover staging from a crashed pass
    build(l.corpus.select((Seq("vec_id", "embedding") ++ metaCols)
      .map(col): _*), dim, lloydSteps, subspaces, subDim, k, staging,
      metaCols, gateBits = l.gateBits)
    // carry the manifest chain across the swap: build() started a
    // fresh chain (version 0) inside staging, and swapping that in
    // would REGRESS the version a pinned reader uses for change
    // detection. Replace staging's chain with the live one, then
    // commit the staging listing as the next version — monotone
    // across rebuilds, exactly like ArtifactManifest.clusterBuild.
    val liveMan = new org.apache.hadoop.fs.Path(
      s"$dir/corpus/_manifests")
    if (fs.exists(liveMan)) {
      val stMan = new org.apache.hadoop.fs.Path(
        s"$staging/corpus/_manifests")
      // build() stored the rebuilt corpus's schema in the staging
      // chain's pin — lift it before that chain is replaced, so the
      // re-commit under the live chain needs no schema inference
      val stagedSchema = ArtifactManifest
        .latest(s, s"$staging/corpus").flatMap(_.schemaJson)
      fs.delete(stMan, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, liveMan, fs, stMan,
        false, s.sparkContext.hadoopConfiguration)
      ArtifactManifest.recordBuild(s, s"$staging/corpus", stagedSchema)
    }
    // pre-commit fence: the staging build (training + full-corpus
    // encode) is rebuild's longest stage — a holder that lost the
    // lease during it must die HERE, before the swap publishes a
    // tree trained against a corpus a stealer may have since mutated
    WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
    LayoutOps.swapInto(fs, dp, sp)
    }

  /** Delete vectors from the artifact by id — the TAKEDOWN path (the
    * deletion obligation an LLM-corpus index legally carries): the
    * tombstoned ids' rows leave the inverted lists; quantizer state
    * (centroids, codebooks) is untouched, exactly like [[append]]'s
    * frozen-quantizer contract — a delete changes WHAT is indexed,
    * never HOW, so no retrain and no re-encode of survivors. Physical
    * shape is [[LayoutOps.deleteKeysPartitioned]]: only the cells
    * that contain a tombstoned vector are rewritten, a fully-emptied
    * cell's directory is dropped, and a bulk takedown is followed by
    * [[ArtifactManifest.compactGenerations]] like any other burst of small
    * rewrites. Serving after a delete equals serving an index that
    * never contained the ids, under the same quantizers — the
    * oracle-gated contract (s15). `staged = true` routes the rewrite
    * through the crash-isolated staging swap
    * ([[LayoutOps.deleteKeysPartitioned]]'s staged mode).
    */
  def delete(s: SparkSession, dir: String, tombs: DataFrame,
      staged: Boolean = false): Unit =
    WriterLease.withLease(s, DedupIndex.leaseRoot(dir)) {
      // pre-write fence, same contract as append/rebuild
      WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
      // a gate-stamped corpus keeps its bucket-sorted cell files
      // through the takedown (the pushed gate filter's layout)
      LayoutOps.deleteKeysPartitioned(s, s"$dir/corpus", "cell",
        "vec_id", tombs, staged = staged,
        sortWithin = gateBitsOf(s, dir).map(_ => "bucket").toSeq)
      ArtifactManifest.refreshAfterDelete(s, s"$dir/corpus")
    }

  /** The stored-corpus frame the ingest gate probes for one batch —
    * ONE definition shared by the batch gate (s13) and the streaming
    * gate's per-batch lambda (st11), so the two serving shapes cannot
    * drift. `storedBits` is [[gateBitsOf]], read once per gate (per
    * stream / per batch query), never per call. For a stamped
    * artifact under matching geometry the frame is a PLAIN scan of
    * the persisted bucket column — no re-encode, no signBucket
    * derivation — narrowed by the batch's touched-bucket set
    * (≤ 2^bits values, read off the encoded batch: driver-bounded by
    * GEOMETRY, not data), pushed into the parquet scan as an In
    * filter. Against the bucket-sorted file layout, row groups
    * holding only un-touched buckets never leave disk, so the
    * per-batch stored read tracks the batch's collision surface, not
    * the corpus (ScaleProbe `vec gate scan`). Semantics are untouched
    * — the gate's (cell, bucket) equi-join can only match batch
    * buckets anyway. Past the In-list cap (wide geometries) and for
    * unstamped legacy artifacts, the semi-join inside the gate
    * remains the only pruning; a stamp under DIFFERENT bits refuses
    * (stale buckets would silently miss collisions).
    */
  // ---- ADC shortlist report contract ----------------------------------
  // The opt-in ADC shortlist (SimilarityOps.AdcPrefilter) can change
  // admission decisions — ADC does not bound cosine — so the flag's
  // safety rests on the per-corpus recall report (the s18 query).
  // Nothing used to ENFORCE that the report had ever been run: these
  // three members make the report a persisted, stamped artifact
  // beside the index and make [[adcPrefilterFor]] the sanctioned way
  // to construct the flag — it REFUSES (the gate's refuse-loudly
  // convention) when the report is absent, crashed, measured under a
  // different (subDim, bar) geometry, measured against a corpus the
  // manifest has since moved past, or shows a band below
  // `graft.gate.adcMinRecall` (default 1.0). `graft.gate.adcForce=
  // true` is the explicit override for operators who accept the
  // measured loss.

  private def adcReportPath(dir: String) = s"$dir/adc_report"

  /** Persist the artifact's ADC recall report
    * ([[SimilarityOps.adcRecallReport]]'s frame) stamped with the
    * shortlist geometry and `measuredVersion` — the corpus manifest
    * version the report's stored frame was PINNED at
    * ([[gateStoredPinned]]'s first element), [[adcPrefilterFor]]'s
    * freshness token. The caller threads the pin instead of this
    * method re-reading `latest()` at save time: a concurrent append
    * between the stored-frame read and the stamp would otherwise
    * stamp the report fresh for a corpus it never measured, silently
    * satisfying the freshness contract until the NEXT corpus change.
    * (A pin that is already behind `latest()` stamps an
    * immediately-stale report — the honest outcome: the flag
    * refuses/recomputes.) Bands first, stamp last: a crash between
    * the two leaves no stamp, which reads as ABSENT (refuse; re-run
    * converges). The stamp is its own one-row file because an empty
    * band frame (no confirmed pairs) must still carry the geometry.
    */
  def saveAdcReport(s: SparkSession, dir: String, report: DataFrame,
      subDim: Int, bar: Double, measuredVersion: Long): Unit =
    WriterLease.withLease(s, DedupIndex.leaseRoot(dir)) {
      val rp = adcReportPath(dir)
      report.coalesce(1).write.mode("overwrite").parquet(s"$rp/bands")
      WriterLease.verifyHeld(s, DedupIndex.leaseRoot(dir))
      import s.implicits._
      Seq((subDim, bar, measuredVersion))
        .toDF("sub_dim", "bar", "corpus_version")
        .coalesce(1).write.mode("overwrite").parquet(s"$rp/stamp")
    }

  /** The artifact's report rows iff FRESH for (subDim, bar): Left is
    * the human-readable refusal reason.
    */
  private def freshAdcReport(s: SparkSession, dir: String,
      subDim: Int, bar: Double): Either[String, DataFrame] = {
    val rp = adcReportPath(dir)
    val fs = new org.apache.hadoop.fs.Path(rp)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed = Seq("bands", "stamp").forall(p => fs.exists(
      new org.apache.hadoop.fs.Path(s"$rp/$p/_SUCCESS")))
    if (!committed)
      return Left("no committed recall report beside the artifact")
    val st = s.read.parquet(s"$rp/stamp").head()
    val (sd, b, v) = (st.getAs[Int]("sub_dim"),
      st.getAs[Double]("bar"), st.getAs[Long]("corpus_version"))
    if (sd != subDim || b != bar)
      return Left(s"report measured geometry (subDim=$sd, bar=$b), " +
        s"the gate requests (subDim=$subDim, bar=$bar)")
    val cur = ArtifactManifest.latest(s, s"$dir/corpus")
      .map(_.version).getOrElse(-1L)
    if (v != cur)
      return Left(s"report is STALE: measured corpus version $v, " +
        s"the manifest is now at $cur — the corpus changed since")
    Right(s.read.parquet(s"$rp/bands"))
  }

  /** Compute-and-save the report when absent/stale/mismatched — the
    * artifact owner's ensure step: a fresh matching report is left
    * untouched (and `report` never evaluated), so the cost is
    * one-time per corpus change. `measuredVersion` is the corpus pin
    * the report's stored frame was read at (see [[saveAdcReport]]).
    * Serving paths that ensure AND construct should use
    * [[ensuredAdcPrefilter]] — one freshness pass instead of this
    * plus [[adcPrefilterFor]]'s.
    */
  def ensureAdcReport(s: SparkSession, dir: String, subDim: Int,
      bar: Double, measuredVersion: Long)(report: => DataFrame): Unit =
    if (freshAdcReport(s, dir, subDim, bar).isLeft)
      saveAdcReport(s, dir, report, subDim, bar, measuredVersion)

  /** The recall judgment shared by both constructors: every band of
    * a FRESH report at/above `graft.gate.adcMinRecall`, or refuse.
    */
  private def judgeAdcBands(s: SparkSession, dir: String,
      bands: DataFrame): Unit = {
    val minRecall =
      Knobs.double(s, "graft.gate.adcMinRecall", 1.0, 0.0, 1.0)
    val bad = bands.filter(col("recall") < minRecall)
      .orderBy(col("recall")).limit(1).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      s"ADC shortlist on $dir refused: cosine band " +
        s"${bad(0).getAs[Long]("band")} keeps only " +
        s"${bad(0).getAs[Double]("recall")} of exact-confirmed " +
        "pairs (< graft.gate.adcMinRecall=" +
        s"$minRecall) — the " +
        "approximation loses real duplicates at this geometry; " +
        "tighten the bar, or accept the loss explicitly with " +
        "graft.gate.adcForce=true")
  }

  private def adcForced(s: SparkSession): Boolean =
    Knobs.flag(s, "graft.gate.adcForce")

  /** The SANCTIONED constructor of the ADC shortlist flag for an
    * artifact: refuses loudly unless a fresh, geometry-matching
    * recall report with every band at/above `graft.gate.adcMinRecall`
    * sits beside the index (see the contract block above);
    * `graft.gate.adcForce=true` overrides.
    */
  def adcPrefilterFor(s: SparkSession, dir: String,
      books: ProductQuantization.Codebooks, subDim: Int,
      bar: Double): SimilarityOps.AdcPrefilter = {
    if (!adcForced(s))
      freshAdcReport(s, dir, subDim, bar) match {
        case Left(reason) => throw new IllegalStateException(
          s"ADC shortlist on $dir refused: $reason. Run the recall " +
            "report against the CURRENT corpus and geometry " +
            "(SimilarityOps.adcRecallReport -> saveAdcReport; the " +
            "s18 query) before flipping the flag, or override with " +
            "graft.gate.adcForce=true")
        case Right(bands) => judgeAdcBands(s, dir, bands)
      }
    SimilarityOps.AdcPrefilter(books, subDim, bar)
  }

  /** Ensure-and-construct in ONE freshness pass — the serving entry
    * (s17): a stale/absent report is recomputed and saved, then the
    * just-written bands are judged directly (no second stamp/
    * manifest read — the interleaved A/B that motivated this showed
    * the double pass costing ~0.4 s of small-read latency per gate
    * call). Identical refusal semantics to ensure + construct, with
    * one deliberate difference: PERSISTING the recomputed report is
    * best-effort. Serving safety comes from judging the bands just
    * measured, not from the file — so a query racing a long-running
    * writer (a stream holds the artifact lease for its whole replay)
    * or running on a read-only serving replica judges its computed
    * bands and serves instead of failing on the lease/write; the
    * next call recomputes. `measuredVersion` is the corpus pin the
    * report's stored frame was read at (see [[saveAdcReport]]).
    */
  def ensuredAdcPrefilter(s: SparkSession, dir: String,
      books: ProductQuantization.Codebooks, subDim: Int,
      bar: Double, measuredVersion: Long)(report: => DataFrame)
      : SimilarityOps.AdcPrefilter = {
    if (!adcForced(s)) {
      val bands = freshAdcReport(s, dir, subDim, bar) match {
        case Left(_) =>
          val r = report
          try {
            saveAdcReport(s, dir, r, subDim, bar, measuredVersion)
            // judge the READ-BACK bands: the write consumed the one
            // evaluation of the report query, re-judging `r` would
            // recompute it
            s.read.parquet(s"${adcReportPath(dir)}/bands")
          } catch {
            // refuse-loudly stays loud: a knob refusal
            // ([[Knobs.Refused]]) is a misconfiguration and must not
            // hide behind a stderr warn. It is matched by TYPE, not
            // as IllegalArgumentException: the lease protocol's
            // transient races (acquire's two-stealer read-back,
            // verify's lease-lost) also surface as
            // IllegalArgumentException, and those are ordinary
            // contention — the serve-from-computed-bands fallback is
            // exactly for them, like the IllegalStateException
            // contention path below
            case e: Knobs.Refused => throw e
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[graft] ADC report on $dir not " +
                s"persisted (${e.getMessage}); serving from the " +
                "computed bands — the next call re-measures")
              r
          }
        case Right(b) => b
      }
      judgeAdcBands(s, dir, bands)
    }
    SimilarityOps.AdcPrefilter(books, subDim, bar)
  }

  private[graft] def gateStored(ss: SparkSession, dir: String,
      bits: Int, storedBits: Option[Int], enc: DataFrame,
      push: Boolean = true, rawList: Boolean = false): DataFrame =
    gateStoredPinned(ss, dir, bits, storedBits, enc, push, rawList)._2

  /** [[gateStored]] plus the corpus manifest version the stored frame
    * was pinned at (`-1` for raw-listed/unmanaged trees) — the
    * version an ADC recall report measured against this frame must be
    * STAMPED with ([[saveAdcReport]]'s `measuredVersion`): re-reading
    * `latest()` at stamp time instead would freshen a report for a
    * corpus a concurrent append moved past.
    */
  private[graft] def gateStoredPinned(ss: SparkSession, dir: String,
      bits: Int, storedBits: Option[Int], enc: DataFrame,
      push: Boolean = true, rawList: Boolean = false)
      : (Long, DataFrame) = {
    storedBits.foreach(b => require(b == bits,
      s"VectorIndex.gateStored: index at $dir is gate-stamped " +
        s"bits=$b but the gate requested bits=$bits — rebuild the " +
        "index or match the geometry"))
    // manifest-pinned read for manifest-managed artifacts (the s13
    // batch path): a raw directory listing resurrects a crashed
    // append's uncommitted orphan generation and takedown-deleted
    // files a deferred vacuum hasn't reaped, so the gate's stored
    // side could block admissions against phantom rows l.corpus no
    // longer serves. The STREAMING root legitimately passes
    // `rawList = true`: its per-batch appends must be visible to the
    // next batch immediately, and the run-private root has no
    // concurrent mutator to orphan files under it.
    val (pin, corpus0) =
      if (rawList) (None, ss.read.parquet(s"$dir/corpus"))
      else ArtifactManifest.pinnedFrame(ss, s"$dir/corpus")
    val pinVer = pin.map(_.version).getOrElse(-1L)
    val corpus = corpus0.withColumn("cell", col("cell").cast("long"))
    val served = if (push && storedBits.contains(bits)) {
      // the text probe's tiered set-prune, unchanged semantics:
      // NULL batch buckets (degenerate embeddings) never enter the
      // set, an empty set short-circuits the corpus scan, <= the
      // or-chain cap pushes the exact catalyst In, wider batches
      // (diverse arrivals under bits 11-16 geometries) ride the
      // native UDP scan up to [[DedupIndex.nativePushMax]], and only
      // past THAT does the plain stored scan serve — the gate's
      // (cell, bucket) semi prune still applies downstream in every
      // tier (the native tier's page-superset is closed by it the
      // same way the text gate's equi-join closes its own)
      val nativeReader: Seq[Long] => DataFrame = { vals =>
        val cd = s"$dir/corpus"
        // the CAPTURED pin, not a scan-time re-pin: the re-read must
        // serve exactly the generation set `corpus` serves, or the
        // tier choice becomes decision-visible under a concurrent
        // append (the manifest exists to give readers that pin)
        val paths =
          if (rawList) Seq(cd)
          else pin match {
            case Some(p) => p.generations.sorted
              .map(g => s"$cd/ingest=$g")
            case None => Seq(cd)
          }
        if (paths.isEmpty) corpus.filter(lit(false))
        else graft.sources.NativeParquetIn
          .read(ss, cd, paths, "bucket", vals)
          .withColumn("cell", col("cell").cast("long"))
          .select(corpus.columns.map(col).toIndexedSeq: _*)
      }
      // ~300 B/row for the encoded corpus (4 bytes x the 64-float
      // embedding + id/norm/code/bucket) — the cost model only needs
      // the order of magnitude (factor-8 guard); forStore prices the
      // listing and the footer geometry lazily, only when the
      // touched set actually overflows the catalyst tier
      DedupIndex.touchedPrune(corpus, enc, push = true,
        Some(DedupIndex.NativePush.forStore(ss, s"$dir/corpus", 300L,
          nativeReader)))
    } else if (storedBits.contains(bits)) corpus
    else corpus.withColumn("bucket",
      SimilarityOps.signBucket("embedding", bits))
    (pinVer, served)
  }

  /** CONTINUOUS vector ingestion: the artifact's probe → gate →
    * append loop driven from a Structured Streaming file source — the
    * embedding twin of [[DedupIndex.streamIngestGate]]. Vectors below
    * `splitId` build the index; the rest replay as `nFiles` id-ordered
    * micro-batches ([[graft.streaming.StreamingOps.stageOrderedArrivals]]).
    * Each batch is encoded under the artifact's FROZEN quantizers,
    * gated by [[SimilarityOps.ingestGate]] against the stored corpus
    * (candidates agree on (cell, sign-bucket); exact-cosine confirm;
    * earliest-wins admission), then appended — so by the same
    * monotone-arrival argument as the text gate, the stream's final
    * decisions equal the one-shot batch gate's (s13) and the stream
    * is held to the BATCH oracle. Decisions parquet keeps a `batch`
    * column for the spec; the returned frame drops it.
    */
  def streamIngestGate(ss: SparkSession, e0: DataFrame, dim: Int,
      lloydSteps: Int, subspaces: Int, subDim: Int, k: Int,
      bits: Int, splitId: Long, threshold: Double, nFiles: Int,
      root: String, compactEvery: Int = 16): DataFrame = {
    // RESTART SAFETY (same contract as the text twin,
    // [[DedupIndex.streamIngestGate]]): a recovery re-invocation must
    // SKIP the build — rebuilding statically overwrites the corpus,
    // destroying committed batches' appended cells that the
    // checkpoint will never replay. The staging signature guard
    // pins the root to this exact arrivals frame.
    // the COMMIT MARKER, not bare directory existence: the corpus
    // dir exists from the first committer temp file, so a crash
    // mid-build would otherwise skip the rebuild and gate every
    // batch against a partial (or unreadable) corpus
    val built = new org.apache.hadoop.fs.Path(
      s"$root/index/corpus/_SUCCESS")
    val bfs = built.getFileSystem(ss.sparkContext.hadoopConfiguration)
    // the STREAM holds the artifact's writer lease for its whole run
    // (driver-thread acquire, per-batch asOwner transfer — the text
    // twin's contract): a concurrent batch mutator on the same index
    // root refuses at ENTRY; a crashed stream's lease is stolen past
    // the horizon like any holder's
    val lr = DedupIndex.leaseRoot(s"$root/index")
    val lease = WriterLease.acquire(ss, lr)
    try {
    // the arrivals staging is independent of the index build
    // (separate trees, own completion/signature guards) — overlap
    // them (Par.both; the text twin's init rationale). The
    // lease-fenced build stays under asOwner on the calling thread.
    val (stagedN, _) = Par.both {
      graft.streaming.StreamingOps.stageOrderedArrivals(
        e0.filter(col("vec_id") >= splitId), "vec_id", nFiles,
        s"$root/arrivals")
    } {
      WriterLease.asOwner(ss, lr, lease) {
      if (!bfs.exists(built))
        build(e0.filter(col("vec_id") < splitId)
            .select("vec_id", "embedding"),
          dim, lloydSteps, subspaces, subDim, k, s"$root/index",
          gateBits = Some(bits))
      }
    }
    // gate geometry: a stamped artifact serves its PERSISTED bucket
    // column (written by build and every batch append below — the
    // corpus-side signBucket derivation used to run over the FULL
    // corpus every micro-batch, the one O(corpus)-per-batch cost in
    // this loop); a stamp under different bits means the checkpoint
    // is being resumed against an index built for another geometry —
    // joining its buckets would silently miss collisions, so refuse.
    // No stamp (an artifact predating the stored column) keeps the
    // derive-on-the-fly behavior.
    val storedBits = gateBitsOf(ss, s"$root/index")
    storedBits.foreach(b => require(b == bits,
      s"streamIngestGate: index at $root/index is gate-stamped " +
        s"bits=$b but this stream requested bits=$bits — rebuild " +
        "the index or match the geometry"))
    // zero arrivals would leave the decisions store absent and the
    // final read failing with a bare path error — fail with the cause
    require(stagedN > 0,
      s"streamIngestGate: no arrivals at or past splitId=$splitId — " +
        "nothing to gate")
    // quantizers are FROZEN: collect them once; per batch only the
    // corpus frame is re-created so its scan re-lists the files the
    // previous batch appended
    val frozen = load(ss, s"$root/index")
    // COST-BASED pushdown for the stream: the touched-bucket In
    // filter costs one distinct+collect JOB per micro-batch, which a
    // small corpus's scan can never repay (measured ~+2 s over the
    // 3-batch sf0.1 stream for zero skipped bytes at bits=4). Decide
    // ONCE per stream from the corpus's physical size — past the
    // threshold the skipped row groups dominate the collect
    // (ScaleProbe `vec gate scan`), below it the plain stored scan
    // is strictly cheaper. The one-shot batch gate (s13) always
    // pushes: its single collect is plan-construction cost, and the
    // plan spec pins the pushed shape there.
    val pushMinBytes = Knobs.long(ss,
      "graft.gate.pushdownMinBytes", 256L << 20, min = 0)
    val pushInStream = {
      val p = new org.apache.hadoop.fs.Path(s"$root/index/corpus")
      p.getFileSystem(ss.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength > pushMinBytes
    }
    // sketch rebuilt ONCE after the replay (see the text twin): drop
    // first so every mid-stream crash leaves no sketch — unpruned
    // serving, never an under-set
    DedupIndex.dropMembers(ss, s"$root/index")
    graft.streaming.StreamingOps.replayOrdered(ss, e0.schema,
        s"$root/arrivals", s"$root/ckpt") { (batch, batchId) =>
      // per-batch ownership transfer + heartbeat + stolen-lease fence
      // (the text twin's contract)
      WriterLease.asOwner(ss, lr, lease) {
        // the batch is encoded ONCE (norm, cell, PQ code, bucket),
        // persisted for the batch's lifetime, and both served to the
        // gate and appended — instead of encoding separately for each
        val enc = ProductQuantization.encode(
            SimilarityOps.withNorm(
              batch.select("vec_id", "embedding"), "embedding", "n")
              .withColumn("cell",
                SimilarityOps.ivfAssign(frozen.cents, dim)),
            "embedding", frozen.books, subDim, "code")
          .withColumn("bucket",
            SimilarityOps.signBucket("embedding", bits))
          .persist()
        val stored = gateStored(ss, s"$root/index", bits, storedBits,
          enc, push = pushInStream, rawList = true)
        try {
          // batch-keyed dynamic overwrites: a replayed micro-batch
          // replaces its own decisions/generation instead of
          // double-writing — effectively-once ingest.
          // The decisions write and the generation append are
          // INDEPENDENT (both derive from the persisted `enc`; the
          // decisions read the PRE-batch corpus whose listing
          // `stored` pinned; the append writes only the new
          // ingest=batchId+1 partitions) — overlapped, the text
          // twin's batch-body rationale verbatim.
          Par.both {
            SimilarityOps.ingestGate(stored, enc, threshold)
              .withColumn("batch", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch").parquet(s"$root/decisions")
          } {
            // the batch's bucket (already computed for the gate) is
            // appended too, keeping the stored column complete so the
            // NEXT batch's stored side never derives
            val rows = enc
              .select((Seq("vec_id", "embedding", "n", "cell", "code")
                ++ storedBits.map(_ => "bucket").toSeq).map(col): _*)
              .withColumn("ingest", lit(batchId + 1))
            // constant `ingest` out of the sort list — see build's
            // layout comment
            storedBits.fold(rows)(_ => rows.sortWithinPartitions(
                col("cell"), col("bucket")))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .option("parquet.page.row.count.limit",
                DedupIndex.pageRowLimit(ss))
              .partitionBy("ingest", "cell")
              .parquet(s"$root/index/corpus")
            ArtifactManifest.recordAppend(ss, s"$root/index/corpus",
              batchId + 1, Some(ArtifactManifest.frameShapeJson(rows.schema,
          Seq("ingest", "cell"))))
          }
        } finally enc.unpersist()
      }
      }
    WriterLease.asOwner(ss, lr, lease) {
    // maintenance AFTER the replay completes — never inside the loop
    // (a replayed batch's generation-keyed overwrite would target a
    // partition the collapse removed); every batch is
    // checkpoint-committed here, so nothing can replay
    if (LayoutOps.ingestGenerations(ss, s"$root/index/corpus")
        .size >= compactEvery)
      ArtifactManifest.compactGenerationsSized(ss,
        s"$root/index/corpus", "cell",
        sortWithin = storedBits.map(_ => "bucket").toSeq)
    // sketch over every ingested vec id (corpus + all arrivals): one
    // column-pruned pass per stream, sized fresh
    DedupIndex.buildMembers(e0, "vec_id", s"$root/index")
    }
    ss.read.parquet(s"$root/decisions").drop("batch")
    } finally WriterLease.release(ss, lease)
  }

  /** Load an artifact: quantizer state to the driver (dim-sized, the
    * broadcast-dim legitimacy class), corpus as a lazy cell-partitioned
    * scan. The partition column comes back through partition-type
    * inference, so `cell` is re-cast to its written long type.
    */
  /** Pre-drop `fact` rows whose key cannot be a LIVE vec id — the
    * persisted membership sketch [[build]]/[[appendWith]] maintain
    * beside the corpus ([[DedupIndex]]'s composition; same
    * superset-through-delete contract, so results compose
    * byte-identically with the exact join that follows).
    */
  def memberPrune(s: SparkSession, dir: String, fact: DataFrame,
      keyCol: String,
      orKeep: org.apache.spark.sql.Column = lit(false)): DataFrame =
    DedupIndex.memberPrune(s, dir, fact, keyCol, orKeep)

  def load(s: SparkSession, dir: String): Loaded = {
    // two independent dim-sized collects — overlap them (Par.both;
    // read-only): load sits on every serve/append/rebuild entry and
    // each collect is all driver latency at these sizes
    val (cr, br) = Par.both {
      s.read.parquet(s"$dir/centroids").collect().sortBy(_.getLong(0))
    } {
      s.read.parquet(s"$dir/codebooks").collect()
        .map(r =>
          (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
    }
    val cents = SimilarityOps.IvfCentroids(
      cr.map(_.getLong(0)),
      cr.flatMap(_.getSeq[Double](1)),
      cr.map(_.getDouble(2)))
    val subspaces = br.keys.map(_._1).max + 1
    val k = br.keys.map(_._2).max + 1
    val books: ProductQuantization.Codebooks =
      Array.tabulate(subspaces)(j => Array.tabulate(k)(c => br((j, c))))
    val corpus = ArtifactManifest.frame(s, s"$dir/corpus")
      .withColumn("cell", col("cell").cast("long"))
      .withColumn("ingest", col("ingest").cast("long"))
    val gb = gateBitsOf(s, dir)
    // the stamp is written AFTER the corpus (build's crash ordering),
    // so stamp-present-column-absent means external tampering, not a
    // crash window — refuse rather than serve wrong buckets
    gb.foreach(_ => require(corpus.columns.contains("bucket"),
      s"VectorIndex.load: $dir carries a gate stamp but its corpus " +
        "has no bucket column — rebuild the artifact"))
    Loaded(cents, books, corpus, gb)
  }

  /** Cell-routed ADC top-k over a loaded artifact — s8's serving shape
    * (broadcast query table, equi-join on cell, native `pq_adc`), with
    * the candidate scan hitting ONLY the queries' partitions (via
    * dynamic partition pruning; spec-pinned).
    *
    * `filterKeys` names artifact metadata columns a candidate must
    * MATCH the query on (s12's filtered serving): the predicate is
    * folded into the candidate equi-join key alongside cell, so the
    * hash join drops disallowed candidates at probe time — no second
    * scan, no post-filter pass over scored pairs.
    */
  def serveTopK(l: Loaded, subDim: Int, nQueries: Long, topK: Int,
      filterKeys: Seq[String] = Seq.empty): DataFrame = {
    val q = l.corpus.filter(col("vec_id") < nQueries)
      .select(Seq(col("vec_id").as("q_id"),
        ProductQuantization.adcTablesCol(
          col("embedding"), l.books, subDim).as("qt"),
        col("cell")) ++ filterKeys.map(col): _*)
    val sim = broadcast(q)
      .join(l.corpus.select(
          (Seq("vec_id", "cell", "code") ++ filterKeys).map(col): _*),
        Seq("cell") ++ filterKeys)
      .filter(col("q_id") =!= col("vec_id"))
      .select(Seq(col("q_id"), col("vec_id"), col("cell")) ++
        filterKeys.map(col) :+
        round(ProductQuantization.adcLookupCol(
          col("code"), col("qt"), l.books.head.length), 6).as("adc_dist"): _*)
    // sort-free top-k (TopKMin aggregator): the scored stream never
    // sorts; the shuffle carries queries×k rows. Every candidate
    // shares the query's (cell, filterKeys), so grouping by them
    // preserves the output columns.
    val f = graft.functions.TopKMin(topK)
    val gcols = Seq(col("q_id"), col("cell")) ++ filterKeys.map(col)
    sim.groupBy(gcols: _*)
      .agg(f(col("adc_dist"), col("vec_id")).as("top"))
      .select(gcols :+ posexplode(col("top")): _*)
      .select(Seq(col("q_id"), col("col._2").as("vec_id"),
        col("cell")) ++ filterKeys.map(col) :+
        col("col._1").as("adc_dist") :+
        (col("pos") + 1).cast("long").as("rank"): _*)
  }
}
