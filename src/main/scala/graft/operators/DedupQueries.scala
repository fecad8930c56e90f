package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ArtifactManifest, DedupIndex, DedupOps, Knobs,
  TempArtifacts, TextOps, VectorIndex}

/** Deduplication inventory over `documents`: exact content-hash dedup,
  * MinHash signatures, banded LSH buckets + candidate pairs, SimHash,
  * and char-4-gram Jaccard verification. Sketch/bucket hash primitives
  * are the md5-based 60-bit [[TextOps.hash15]] so DuckDB oracles compute
  * bit-identical values; the exact-dedup GROUP KEY alone uses the full
  * 128-bit md5 (collision-safety at corpus scale — see
  * [[DedupOps.exactDupGroups]]).
  */
object DedupQueries {
  import Tables._

  private[graft] val K = 4 // minhash signature width in the checked queries
  private[graft] val RowsPerBand = 2
  private val DecontamN = 8 // decontamination word-n-gram width
  // d12/st10 ingest gate: docs >= the split are "arriving"
  private[graft] val IngestSplit = 400L
  private[graft] val IngestJacThreshold = 0.5 // confirm-duplicate bar
  // d13 takedown: tombstoned doc_ids are ≡ DocDelRes (mod DocDelMod)
  private[graft] val DocDelMod = 13L
  private[graft] val DocDelRes = 2L

  // --- shared corpus-assembly stages (x8 gate + x10 funnel) ----------
  // Each stage frame/predicate is defined ONCE and composed by both
  // queries, so the funnel report can never drift from the gate it
  // observes (previously x10 re-implemented these by copy; only the
  // final stage was cross-checked).

  /** Exact-dedup survivor ids (d1's winners). */
  private def survivorIds(docs: DataFrame): DataFrame =
    DedupOps.exactDupGroups(docs, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))

  /** Benchmark/holdout membership (the synthetic eval split). */
  private def isHoldout: Column = col("doc_id") % 20 === 7

  /** Ids of training docs sharing any word DecontamN-gram with the
    * holdout set (d10's contamination criterion). Grams travel as
    * native 60-bit shingle hashes (engine-identical, so overlap is
    * preserved exactly); the bench gram set broadcasts as longs;
    * explode_outer dodges the InferFiltersFromGenerate trap (see d10).
    */
  private def contaminatedIds(docs: DataFrame): DataFrame =
    decontamJoined(docs, useBloom = false).select("doc_id").distinct()

  /** The decontamination join — training gram stream × eval gram set
    * — with the eval set attached one of two ways:
    *  - `useBloom = false`: explicit `broadcast(benchGrams)` — the
    *    map-side semi-filter; the exploded training grams never
    *    shuffle. Right whenever the eval-gram key set fits the
    *    broadcast budget (every tested SF).
    *  - `useBloom = true`: the eval set has outgrown the budget — a
    *    hashed relation of 10⁸+ gram longs on every executor is the
    *    failure, not the plan. Front the exploded training grams with
    *    the codegen'd [[BloomPrune]] probe (superset filter, in the
    *    scan stage ahead of any exchange), then exact-join WITHOUT a
    *    broadcast: only plausible hits (~fpp of the stream) reach the
    *    shuffle, and false positives die in the exact join — results
    *    byte-identical on both paths (spec-pinned). The sketch build
    *    is one aggregate over the eval grams; `evalKeysHint` sizes it
    *    without a separate count action (callers with a physical-size
    *    proxy pass it; None falls back to counting — one extra
    *    eval-side evaluation).
    */
  private[graft] def decontamJoined(docs: DataFrame,
      useBloom: Boolean,
      evalKeysHint: Option[Long] = None): DataFrame = {
    val staged = docs
      .withColumn("__toks", TextOps.tokens(col("text")))
      .withColumn("__gs",
        expr(s"shingle_hashes(__toks, $DecontamN, 0)"))
    val benchGrams = staged.filter(isHoldout)
      .select(explode_outer(col("__gs")).as("g")).distinct()
    val train = staged.filter(!isHoldout)
      .select(col("doc_id"), explode_outer(col("__gs")).as("g"))
    if (!useBloom) train.join(broadcast(benchGrams), Seq("g"))
    else {
      val (bits, kh) = graft.operators.BloomPrune.buildSized(
        benchGrams, "g",
        expectedKeys = math.max(1L,
          evalKeysHint.getOrElse(benchGrams.count())),
        fpp = 0.02)
      graft.operators.BloomPrune.prune(train, "g", bits, kh)
        .join(benchGrams, Seq("g"))
    }
  }

  /** Deterministic 0-99 split bucket (x4's hash split). */
  private def splitBucket: Column =
    pmod(TextOps.hash15(col("doc_id"), "split"), lit(100))

  /** Minimum-length quality floor. */
  private def lengthOk: Column =
    size(TextOps.tokens(col("text"))) >= 40

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // d1: exact dedup — survivor + duplicate count per content hash.
    "d1_exact_dedup" -> ((s, d) =>
      DedupOps.exactDupGroups(documents(s, d), "text", "doc_id")),

    // d2: minhash signature (k=4) per document.
    "d2_minhash_sig" -> ((s, d) =>
      DedupOps.withMinHash(documents(s, d), "text", K)
        .select(col("doc_id"), col("mh0"), col("mh1"), col("mh2"),
          col("mh3"))),

    // d3: banded LSH bucket assignment (2 bands × 2 rows).
    "d3_lsh_buckets" -> ((s, d) =>
      DedupOps.lshBuckets(
        DedupOps.withMinHash(documents(s, d), "text", K),
        "doc_id", K, RowsPerBand)),

    // d4: LSH candidate pairs — docs sharing any band bucket. On this
    // synthetic corpus collisions are rare; empty output still
    // hash-checks against the oracle. The bucket frame is persisted:
    // the self-join would otherwise evaluate the whole
    // shingle→minhash→band subtree once per side. Cleanup is
    // centralized: Verify/Bench clearCache() between queries, so the
    // cache cannot accumulate across an 80-query run.
    "d4_lsh_pairs" -> ((s, d) => {
      val buckets = DedupOps.lshBuckets(
        DedupOps.withMinHash(documents(s, d), "text", K),
        "doc_id", K, RowsPerBand).persist()
      DedupOps.lshCandidatePairs(buckets, "doc_id")
    }),

    // d5: n-gram Jaccard over a fixed 25-doc block (candidate
    // verification shape — pairwise only within a bounded block, never
    // all-pairs at scale).
    "d5_ngram_jaccard" -> ((s, d) => {
      val g = documents(s, d).filter(col("doc_id") < 25)
        .select(col("doc_id"), TextOps.charNgrams("text", 4).as("grams"))
      val a = g.select(col("doc_id").as("a"), col("grams").as("ga"))
      val b = g.select(col("doc_id").as("b"), col("grams").as("gb"))
      a.join(b, col("a") < col("b"))
        .select(col("a"), col("b"),
          round(DedupOps.jaccard(col("ga"), col("gb")), 4).as("jac"))
    }),

    // d6: 16-bit simhash per document (64 in production; 16 keeps the
    // oracle expression tractable). Token hashes staged as a column so
    // the 16 bit-majority terms share one md5 pass.
    "d6_simhash" -> ((s, d) =>
      documents(s, d)
        .withColumn("__ths", DedupOps.tokenHashes("text"))
        .select(col("doc_id"),
          DedupOps.simHash("__ths", 16).as("simhash"))),

    // d9: simhash Hamming verification — candidate pairs ranked by the
    // popcount of XOR'd simhashes (the O(1) near-dup distance simhash
    // exists for). Pairwise only within the bounded 25-doc block, like
    // d5; at scale candidates come from banding the simhash bytes, and
    // this distance is the verifier.
    "d9_simhash_hamming" -> ((s, d) => {
      val sh = documents(s, d).filter(col("doc_id") < 25)
        .withColumn("__ths", DedupOps.tokenHashes("text"))
        .select(col("doc_id"), DedupOps.simHash("__ths", 16).as("sh"))
      val a = sh.select(col("doc_id").as("a"), col("sh").as("sa"))
      val b = sh.select(col("doc_id").as("b"), col("sh").as("sb"))
      a.join(b, col("a") < col("b"))
        .select(col("a"), col("b"),
          expr("bit_count(sa ^ sb)").cast("long").as("hd"))
        .filter(col("hd") <= 8)
    }),

    // d8: duplicate-cluster resolution — connected components of the
    // LSH candidate graph (min-label propagation to fixpoint). Every
    // doc maps to its cluster representative (min reachable id); the
    // representative is the dedup survivor. Output restricted to docs
    // in non-trivial clusters plus a total count row would complicate
    // the oracle — the full mapping is emitted instead.
    "d8_dup_clusters" -> ((s, d) => {
      val buckets = DedupOps.lshBuckets(
        DedupOps.withMinHash(documents(s, d), "text", K),
        "doc_id", K, RowsPerBand).persist()
      val pairs = DedupOps.lshCandidatePairs(buckets, "doc_id")
      // seed with the bucket-local min: the first propagation round
      // unrolled into two aggregations over the (already persisted)
      // bucket frame — on LSH's near-clique graphs the loop usually
      // only pays its confirming round (measured in ScaleProbe)
      val out = DedupOps.duplicateClusters(
        documents(s, d).select(col("doc_id")), pairs, "doc_id",
        initLabels = Some(DedupOps.bucketLocalMin(buckets, "doc_id")))
      // out is materialized (eager checkpoint leaf) before return, so
      // the bucket frame can be released here instead of leaking.
      // The result itself is not free()d — Verify/Bench consume it
      // after return and run localCheckpoint mode (no
      // graft.checkpoint.dir), where dropping the reference suffices;
      // reliable-mode callers own the free() call (see DedupOps.free)
      buckets.unpersist()
      out
    }),

    // d10: benchmark decontamination — flag training documents that
    // share any word 8-gram with a held-out benchmark/eval set (the
    // standard n-gram-overlap decontamination step of an LLM data
    // pipeline; production uses 13-grams, 8 keeps the oracle
    // expression aligned with this corpus's ~100-token docs). The
    // benchmark gram set is orders of magnitude smaller than the
    // training corpus, so the join broadcasts it and acts as a
    // map-side semi-filter: the exploded training grams never
    // shuffle — only the (rare) hits reach the per-doc aggregation.
    "d10_decontaminate" -> ((s, d) => {
      // Grams leave the row as native 60-bit shingle hashes (t10's
      // form): the eval-gram set and the per-doc distinct count are
      // over 8-byte longs, never ~50-byte gram strings, and the hash
      // is engine-identical so hit counts match the oracle's hashed
      // grams exactly (any collision collides on BOTH engines).
      // explode_OUTER inside decontamJoined, deliberately: plain
      // explode lets InferFiltersFromGenerate derive `size(__gs) > 0`
      // and push it to the scan with the whole shingle tree inlined,
      // re-tokenizing the doc per gram slot (measured 2.5 s → 18 s at
      // sf0.1 in the string-shingle era). The outer generate admits
      // no such inference; the inner join on `g` drops the null rows.
      // SIZE-BASED eval-set attachment: past the threshold the
      // eval-gram key set has outgrown the broadcast budget and the
      // join switches to the BloomPrune front (decontamJoined's
      // useBloom path — identical output, spec-pinned). The eval-key
      // hint derives from the same physical size (docs bytes / 20
      // holdout share / ~8 B per stored gram hash ≈ an upper bound —
      // oversizing a bloom only wastes bits, never correctness).
      val docsP = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
      val bytes = docsP
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(docsP).getLength
      val maxB = Knobs.long(s,
        "graft.decontam.broadcastMaxBytes", 128L << 20, min = 0)
      DedupQueries.decontamJoined(documents(s, d),
          useBloom = bytes > maxB,
          evalKeysHint = Some(math.max(1L, bytes / 160)))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
    }),

    // x8: the corpus gate — the end-to-end assembly every stage above
    // exists for: keep exactly the docs that are (a) exact-dedup
    // survivors (d1), (b) not benchmark-contaminated (d10), (c) not in
    // the benchmark set themselves, (d) in the train split (x4's hash
    // bucket), and (e) above a minimum length; report the surviving
    // corpus per (lang, source). Every predicate is a pure function of
    // content/id (hash semi/anti joins, no rand()), so the final corpus
    // is reproducible across runs, engines, and repartitioning. Stage
    // frames/predicates are the SHARED builders below — x10's funnel
    // reports on literally the same stages.
    "x8_corpus_final" -> ((s, d) => {
      val docs = documents(s, d)
      docs
        .join(survivorIds(docs), Seq("doc_id"), "left_semi")
        .join(contaminatedIds(docs), Seq("doc_id"), "left_anti")
        .filter(!isHoldout)
        .filter(splitBucket < 80)
        .filter(lengthOk)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // x10: pipeline funnel report — the observability counterpart of
    // x8: per SOURCE, how many documents survive each successive stage
    // of the corpus assembly (total → exact-dedup survivor → + length
    // floor → + decontaminated/non-benchmark → + train split). The
    // per-stage conjunctions are computed as per-row flags from two
    // left joins (survivor set, contaminated set — the same frames x8
    // semi/anti-joins) and folded in ONE aggregation pass, so the
    // funnel costs two joins + one shuffle regardless of stage count;
    // at 100 TB this is the report you page on when a pipeline change
    // silently drops a source. Stage frames/predicates are the SAME
    // shared builders x8 composes — defined once, so the funnel cannot
    // drift from the gate it reports on; the last column per
    // (lang-summed) source equals x8's surviving corpus
    // (PipelineSignalsSpec cross-check).
    "x10_funnel" -> ((s, d) => {
      val docs = documents(s, d)
      val flags = docs
        .join(survivorIds(docs).withColumn("__surv", lit(1)),
          Seq("doc_id"), "left")
        .join(contaminatedIds(docs).withColumn("__cont", lit(1)),
          Seq("doc_id"), "left")
        .select(col("source"),
          col("__surv").isNotNull.as("s1"),
          lengthOk.as("ok_len"),
          (col("__cont").isNull && !isHoldout).as("ok_clean"),
          (splitBucket < 80).as("ok_split"))
      flags.groupBy(col("source")).agg(
        count(lit(1)).as("n_total"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n_dedup"),
        sum(when(col("s1") && col("ok_len"), 1L).otherwise(0L))
          .as("n_quality"),
        sum(when(col("s1") && col("ok_len") && col("ok_clean"), 1L)
          .otherwise(0L)).as("n_clean"),
        sum(when(col("s1") && col("ok_len") && col("ok_clean")
          && col("ok_split"), 1L).otherwise(0L)).as("n_train"))
    }),

    // d7: group-level sketch union — the typed MinHashMerge Aggregator
    // folds each source's doc signatures into one k-vector (elementwise
    // min = signature of the union of shingle sets), with map-side
    // partial merge.
    "d7_source_sketch" -> ((s, d) => {
      // drop docs whose signature is NULL (fewer tokens than the
      // shingle width — the same corpus case lshBuckets filters):
      // the typed Aggregator's Seq[Long] input encoder cannot even
      // represent a null component and would fail the job
      val sig = DedupOps.withMinHash(documents(s, d), "text", K)
        .filter((0 until K).map(i => col(s"mh$i").isNotNull)
          .reduce(_ && _))
        .select(col("source"),
          array((0 until K).map(i => col(s"mh$i")): _*).as("sig"))
      val merged = graft.functions.MinHashMerge(K)(col("sig"))
      sig.groupBy(col("source")).agg(merged.as("sketch"))
        .select(col("source") +:
          (0 until K).map(i =>
            element_at(col("sketch"), i + 1).as(s"smh$i")): _*)
    }),

    // d12: the INGEST GATE — incremental dedup as an admission
    // decision, the query continuous ingestion actually runs: docs at
    // or past IngestSplit are "arriving"; the base side is the
    // PERSISTED DedupIndex artifact (built here, served from disk —
    // the same probe join st10 runs per micro-batch, so the gate and
    // the artifact path cannot drift), each candidate is VERIFIED by
    // char-4-gram Jaccard (d5's builders), and an arrival is admitted
    // iff no confirmed duplicate with an EARLIER doc exists
    // (earliest-wins, non-recursive — deterministic and mirrorable;
    // the corpus-side doc of a confirmed pair always wins, and within
    // the batch the earlier arrival wins). The VERIFICATION store is
    // membership-pruned at the scan: a doc that is neither plausibly
    // indexed (the artifact's sketch — a superset of the indexed ids,
    // so every candidate keeps its grams row and pruning is
    // invisible) nor arriving never shingles. At 100 TB that filter
    // is what keeps the gate's verification side from shingling the
    // whole table when the index holds a fraction of it.
    "d12_ingest_gate" -> ((s, d) => {
      // build-once/serve-many: the gate guards an EXISTING index in
      // production — the fingerprinted root means the first
      // invocation builds, every later one (the bench's repeat runs
      // included) pays only the probe + verify, which is what a gate
      // call costs
      val dir = VectorIndex.artifactRoot(
        s"d12lsh-$K-$RowsPerBand-$IngestSplit", d)
      val docs = documents(s, d)
      val l = DedupIndex.buildOrLoad(
        docs.filter(col("doc_id") < IngestSplit),
        "text", "doc_id", K, RowsPerBand, dir)
      val arrivals = docs.filter(col("doc_id") >= IngestSplit)
      // COST-BASED touched-bucket pushdown on the stored probe side
      // (the same pushdownMinBytes contract as the semi filter below,
      // decided from the BUCKET STORE's physical size): past the
      // threshold the batch's pushed In(bucket) set skips the store's
      // un-touched row groups (bucket-sorted band files — ScaleProbe
      // `text gate scan`); below it the extra evaluation of the
      // batch's signature subtree for the touched-set collect costs
      // more than the whole store scan.
      val pushMin = Knobs.long(s,
        "graft.gate.pushdownMinBytes", 256L << 20, min = 0)
      // LIVE generation bytes, not the raw tree: a raw summary counts
      // orphaned un-vacuumed generations and _manifests metadata, so
      // it can flip the decision on before the live data warrants;
      // the measured bytes ride into probe's native-tier cost model
      // (storeBytes) so the listing is paid once, not twice
      val storeB = ArtifactManifest.liveBytes(s, s"$dir/buckets")
      val pushB = storeB > pushMin
      val cand = DedupIndex.probe(l, arrivals, "text", "doc_id",
        pushTouched = pushB, storeBytes = Some(storeB))
      // COST-BASED semi pre-filter of the verify side (the streaming
      // gate's pushdownMinBytes contract, decided from the documents
      // table's physical size): the verify side is a SHINGLE PASS
      // over the (membership-pruned) corpus, and past the threshold
      // the broadcast semi join pushes below the gram projection so
      // only candidate docs are shingled at all (ScaleProbe `gate
      // decisions`: 13.6 → 4.1 s at a 2M-doc store). Below it the
      // price — the probe join evaluated twice for the id broadcast
      // — exceeds the whole shingle pass (measured +1.5 s at sf0.1).
      val docsP = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
      val semi = docsP.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(docsP).getLength > pushMin
      DedupIndex.gateDecisions(cand,
        DedupIndex.memberPrune(s, dir, docs, "doc_id",
            orKeep = col("doc_id") >= IngestSplit)
          .select(col("doc_id"),
            TextOps.charNgrams("text", 4).as("grams")),
        arrivals, "doc_id", IngestJacThreshold, semiFilter = semi)
    }),

    // d13: INDEX TAKEDOWN for the text-dedup artifact — the delete
    // path (VectorIndex's s15, for the text twin): build the index on
    // the sub-split corpus, tombstone doc_id ≡ 2 (mod 13), compact,
    // then probe the arrivals. A deleted doc's bucket rows leave every
    // band (only affected partitions rewritten — the CDC collapse over
    // a pruned scan), so the probe's candidate pairs equal those of an
    // index BUILT without the tombstoned docs: the stored side of the
    // oracle's pair join excludes them, the arriving side (probed, not
    // stored) is unaffected.
    "d13_index_delete" -> ((s, d) => {
      val dir = TempArtifacts.dir("graft-dedupdel")
      val docs = documents(s, d)
      DedupIndex.build(docs.filter(col("doc_id") < IngestSplit),
        "text", "doc_id", K, RowsPerBand, dir)
      DedupIndex.delete(s, dir, docs.select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(DocDelMod)) === DocDelRes))
      ArtifactManifest.compactGenerations(s, s"$dir/buckets", "band",
        sortWithin = Seq("bucket"))
      DedupIndex.probe(DedupIndex.load(s, dir),
        docs.filter(col("doc_id") >= IngestSplit), "text", "doc_id")
    }),

    // d14: MEMBERSHIP-PRUNED index serving — the BloomPrune artifact
    // composed with the index lifecycle. The index is built on the
    // sub-split corpus and takes a takedown (d13's tombstone set);
    // serving then attaches corpus metadata to the LIVE-INDEXED docs:
    // the documents scan pre-drops rows that cannot be in the index
    // via the persisted membership sketch (codegen'd bloom probe in
    // the scan stage, ahead of the join exchange), and the exact
    // semi-join against the artifact's stored ids removes the false
    // positives — including every tombstoned id, which the sketch (a
    // bloom cannot unlearn) still remembers as a superset. The result
    // is byte-identical to the unpruned join, which is what the
    // oracle computes; at 100 TB the sketch is what keeps the
    // documents side of this join from shipping the whole table.
    "d14_member_prune" -> ((s, d) => {
      val dir = TempArtifacts.dir("graft-dedupmem")
      val docs = documents(s, d)
      DedupIndex.build(docs.filter(col("doc_id") < IngestSplit),
        "text", "doc_id", K, RowsPerBand, dir)
      DedupIndex.delete(s, dir, docs.select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(DocDelMod)) === DocDelRes))
      val live = DedupIndex.load(s, dir).buckets
        .select(col("doc_id")).distinct()
      DedupIndex.memberPrune(s, dir, docs, "doc_id")
        .join(live, Seq("doc_id"), "left_semi")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).as("chars"))
    })
  )

  // --- DuckDB oracle fragments -----------------------------------------
  private def h15(sql: String): String =
    s"('0x' || substr(md5($sql), 1, 15))::BIGINT"
  private val toks = "regexp_split_to_array(trim(text), '\\s+')"
  // Word n-grams joined by ' ' — mirrors TextOps.shinglesFromTokens.
  // Single source of truth for every word-shingle oracle fragment
  // (minhash 3-shingles and decontamination 8-grams alike).
  private def nGramsSql(n: Int): String =
    s"""list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1),
        i -> ${(0 until n).map(k => s"($toks)[i+$k]").mkString(" || ' ' || ")})"""
  // Hashed word n-grams — mirrors the native `shingle_hashes(toks, n,
  // 0)` staging (gram identity as a 60-bit hash; collisions, if any,
  // are identical on both engines).
  private def nGramHashSql(n: Int): String =
    s"list_transform(${nGramsSql(n)}, sh -> ${h15("sh")})"
  private val shingles = nGramsSql(3)
  private def mh(i: Int): String = {
    val (a, b) = (DedupOps.minHashA(i), DedupOps.minHashB(i))
    s"list_min(list_transform(bh, h -> ($a * h + $b) % ${DedupOps.MinHashP}))"
  }
  private val sigCte =
    s"""bh AS (SELECT doc_id,
          list_transform($shingles, sh -> ${h15("sh")} % ${DedupOps.MinHashP})
            AS bh
          FROM documents),
        sig AS (SELECT doc_id,
          ${(0 until K).map(i => s"${mh(i)} AS mh$i").mkString(", ")}
          FROM bh)"""
  // Shingle-less docs (all-NULL signature) are excluded on both sides —
  // see DedupOps.lshBuckets. All mh components are NULL together (they
  // derive from one shingle list), so filtering the sig CTE once mirrors
  // the Spark-side all-components-not-null filter exactly.
  private val sigNotNull =
    (0 until K).map(i => s"mh$i IS NOT NULL").mkString(" AND ")
  private val bucketsSql =
    s"""WITH $sigCte,
        bk AS (
          SELECT doc_id, 0::BIGINT AS band,
                 ${h15("mh0::VARCHAR || ',' || mh1::VARCHAR")} AS bucket
          FROM sig WHERE $sigNotNull
          UNION ALL
          SELECT doc_id, 1::BIGINT AS band,
                 ${h15("mh2::VARCHAR || ',' || mh3::VARCHAR")} AS bucket
          FROM sig WHERE $sigNotNull)"""

  def oracle: Map[String, String] = Map(
    // full 128-bit md5 as the group key (hex string) — mirrors
    // DedupOps.exactDupGroups' collision-safety argument; Spark's
    // md5() and DuckDB's md5() both emit lowercase hex.
    "d1_exact_dedup" ->
      s"""WITH n AS (SELECT doc_id,
            md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
              AS content_fp
          FROM documents)
          SELECT content_fp, min(doc_id) AS keep_id, count(*) AS n_dups
          FROM n WHERE content_fp IS NOT NULL
          GROUP BY content_fp""",
    "d2_minhash_sig" ->
      s"""WITH $sigCte SELECT doc_id, mh0, mh1, mh2, mh3 FROM sig""",
    "d3_lsh_buckets" ->
      s"""$bucketsSql SELECT doc_id, band, bucket FROM bk""",
    "d4_lsh_pairs" ->
      s"""$bucketsSql
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.bucket = y.bucket
           AND x.doc_id < y.doc_id""",
    // d12: the probe's "pairs touching the batch" reduce to
    // b >= IngestSplit because a < b and every arriving id is above
    // the split; verification and admission mirror the Spark side
    // (d5's gram/jaccard fragments, filter on the ROUNDED value).
    "d12_ingest_gate" ->
      s"""$bucketsSql,
          cand AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bk x JOIN bk y
              ON x.band = y.band AND x.bucket = y.bucket
             AND x.doc_id < y.doc_id
            WHERE y.doc_id >= $IngestSplit),
          g AS (
            SELECT doc_id,
              list_distinct(list_transform(
                range(1, greatest(length(text) - 3, 0) + 1),
                i -> substr(text, i, 4))) AS grams
            FROM documents),
          confirmed AS (
            SELECT c.a, c.b,
              round(CAST(len(list_filter(x.grams,
                        t -> list_contains(y.grams, t))) AS DOUBLE)
                / (len(x.grams) + len(y.grams)
                   - len(list_filter(x.grams,
                       t -> list_contains(y.grams, t)))),
                4) AS jac
            FROM cand c
            JOIN g x ON x.doc_id = c.a
            JOIN g y ON y.doc_id = c.b),
          rej AS (
            SELECT b AS doc_id, min(a) AS dup_of
            FROM confirmed WHERE jac >= $IngestJacThreshold
            GROUP BY b)
          SELECT d.doc_id, r.dup_of, r.dup_of IS NULL AS admitted
          FROM documents d LEFT JOIN rej r ON r.doc_id = d.doc_id
          WHERE d.doc_id >= $IngestSplit""",
    // d13: the post-takedown probe — pairs touching the batch where
    // the STORED side (doc_id < split, i.e. what the index persists)
    // excludes the tombstoned docs; arriving docs are probed, not
    // stored, so the tombstone predicate never applies to them. With
    // a < b and every arrival id above the split, the a-side is the
    // only one that can be stored.
    "d13_index_delete" ->
      s"""$bucketsSql
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bk x JOIN bk y
            ON x.band = y.band AND x.bucket = y.bucket
           AND x.doc_id < y.doc_id
          WHERE y.doc_id >= $IngestSplit
            AND (x.doc_id >= $IngestSplit
                 OR x.doc_id % $DocDelMod <> $DocDelRes)""",
    // d14: the pruned serving is byte-identical to the plain exact
    // join — the oracle computes the join with no sketch anywhere.
    // "Live-indexed" = below the split, not tombstoned, and carrying
    // at least one 3-shingle (shingle-less docs never reach the
    // bucket tree — d3's all-null-signature exclusion).
    "d14_member_prune" ->
      s"""WITH live AS (
            SELECT doc_id FROM documents
            WHERE doc_id < $IngestSplit
              AND doc_id % $DocDelMod <> $DocDelRes
              AND len($shingles) > 0)
          SELECT d.source, count(*) AS n,
                 CAST(sum(length(d.text)) AS BIGINT) AS chars
          FROM documents d JOIN live USING (doc_id)
          GROUP BY d.source""",
    "d5_ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(text) - 3, 0) + 1),
               i -> substr(text, i, 4))) AS grams
           FROM documents WHERE doc_id < 25)
         SELECT x.doc_id AS a, y.doc_id AS b,
           round(CAST(len(list_filter(x.grams,
                     t -> list_contains(y.grams, t))) AS DOUBLE)
             / (len(x.grams) + len(y.grams)
                - len(list_filter(x.grams, t -> list_contains(y.grams, t)))),
             4) AS jac
         FROM g x JOIN g y ON x.doc_id < y.doc_id""",
    "d6_simhash" -> {
      val ths = s"list_transform($toks, t -> ${h15("t")})"
      val terms = (0 until 16).map { j =>
        s"(CASE WHEN 2 * len(list_filter($ths, h -> ((h >> $j) & 1) = 1))" +
          s" > len($ths) THEN ${1L << j} ELSE 0 END)"
      }
      s"""SELECT doc_id,
          CAST(${terms.mkString("(", " + ", ")")} AS BIGINT) AS simhash
          FROM documents"""
    },
    "d9_simhash_hamming" -> {
      val ths = s"list_transform($toks, t -> ${h15("t")})"
      val terms = (0 until 16).map { j =>
        s"(CASE WHEN 2 * len(list_filter(ths, h -> ((h >> $j) & 1) = 1))" +
          s" > len(ths) THEN ${1L << j} ELSE 0 END)"
      }
      s"""WITH t AS (SELECT doc_id, $ths AS ths FROM documents
            WHERE doc_id < 25),
          s AS (SELECT doc_id,
            CAST(${terms.mkString("(", " + ", ")")} AS BIGINT) AS sh
            FROM t)
          SELECT x.doc_id AS a, y.doc_id AS b,
            bit_count(xor(x.sh, y.sh)) AS hd
          FROM s x JOIN s y ON x.doc_id < y.doc_id
          WHERE bit_count(xor(x.sh, y.sh)) <= 8"""
    },
    // Recursive transitive closure over the bidirectional candidate
    // graph; min reachable id per doc = the component representative
    // (graph is undirected, so min over reachable = component min).
    // RECURSIVE must follow WITH directly, hence the replaceFirst.
    "d8_dup_clusters" ->
      s"""${bucketsSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
          p AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bk x JOIN bk y
              ON x.band = y.band AND x.bucket = y.bucket
             AND x.doc_id < y.doc_id),
          e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
          reach AS (
            SELECT doc_id AS v, doc_id AS lbl FROM documents
            UNION
            SELECT e.b AS v, reach.lbl
            FROM reach JOIN e ON e.a = reach.v)
          SELECT v AS doc_id, min(lbl) AS cluster_id
          FROM reach GROUP BY v""",
    "d10_decontaminate" ->
      s"""WITH g AS (
            SELECT doc_id, ${nGramHashSql(DecontamN)} AS gs FROM documents),
          eg AS (SELECT DISTINCT unnest(gs) AS g FROM g
                 WHERE doc_id % 20 = 7),
          tg AS (SELECT doc_id, unnest(gs) AS g FROM g
                 WHERE doc_id % 20 <> 7)
          SELECT tg.doc_id, count(DISTINCT tg.g) AS n_hits
          FROM tg JOIN eg USING (g) GROUP BY tg.doc_id""",
    "x8_corpus_final" ->
      s"""WITH n AS (SELECT doc_id,
            md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
              AS content_fp
          FROM documents),
          surv AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY content_fp),
          g AS (SELECT doc_id, ${nGramHashSql(DecontamN)} AS gs FROM documents),
          eg AS (SELECT DISTINCT unnest(gs) AS g FROM g
                 WHERE doc_id % 20 = 7),
          cont AS (SELECT DISTINCT tg.doc_id
                   FROM (SELECT doc_id, unnest(gs) AS g FROM g
                         WHERE doc_id % 20 <> 7) tg
                   JOIN eg USING (g))
          SELECT d.lang, d.source, count(*) AS n_docs
          FROM documents d
          JOIN surv USING (doc_id)
          WHERE d.doc_id NOT IN (SELECT doc_id FROM cont)
            AND d.doc_id % 20 <> 7
            AND ('0x' || substr(md5('split|' || d.doc_id), 1, 15))::BIGINT
                  % 100 < 80
            AND len(regexp_split_to_array(trim(d.text), '\\s+')) >= 40
          GROUP BY d.lang, d.source""",
    "x10_funnel" ->
      s"""WITH n AS (SELECT doc_id,
            md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
              AS content_fp
          FROM documents),
          surv AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY content_fp),
          g AS (SELECT doc_id, ${nGramHashSql(DecontamN)} AS gs FROM documents),
          eg AS (SELECT DISTINCT unnest(gs) AS g FROM g
                 WHERE doc_id % 20 = 7),
          cont AS (SELECT DISTINCT tg.doc_id
                   FROM (SELECT doc_id, unnest(gs) AS g FROM g
                         WHERE doc_id % 20 <> 7) tg
                   JOIN eg USING (g)),
          f AS (
            SELECT d.source,
              (d.doc_id IN (SELECT doc_id FROM surv)) AS s1,
              (len(regexp_split_to_array(trim(d.text), '\\s+')) >= 40)
                AS ok_len,
              (d.doc_id NOT IN (SELECT doc_id FROM cont)
                AND d.doc_id % 20 <> 7) AS ok_clean,
              (('0x' || substr(md5('split|' || d.doc_id), 1, 15))::BIGINT
                % 100 < 80) AS ok_split
            FROM documents d)
          SELECT source, count(*) AS n_total,
            CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dedup,
            CAST(sum(CASE WHEN s1 AND ok_len THEN 1 ELSE 0 END) AS BIGINT)
              AS n_quality,
            CAST(sum(CASE WHEN s1 AND ok_len AND ok_clean
              THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
            CAST(sum(CASE WHEN s1 AND ok_len AND ok_clean AND ok_split
              THEN 1 ELSE 0 END) AS BIGINT) AS n_train
          FROM f GROUP BY source""",
    "d7_source_sketch" ->
      s"""WITH bh AS (SELECT source,
            list_transform($shingles, sh -> ${h15("sh")} % ${DedupOps.MinHashP})
              AS bh
          FROM documents),
          sig AS (SELECT source,
            ${(0 until K).map(i => s"${mh(i)} AS mh$i").mkString(", ")}
          FROM bh)
          SELECT source,
            ${(0 until K).map(i => s"min(mh$i) AS smh$i").mkString(", ")}
          FROM sig WHERE $sigNotNull GROUP BY source"""
  )
}
