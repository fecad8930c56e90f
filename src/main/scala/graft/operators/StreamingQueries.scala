package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ArtifactManifest, CdcOps, DedupIndex, Par, TempArtifacts, VectorIndex}
import graft.streaming.StreamingOps

/** Structured Streaming inventory over the `events` stream: tumbling
  * event-time windows, session windows, and the reference's incremental
  * resume (§2.10) as an append stream. Each query runs the stream to
  * completion (Trigger.AvailableNow) and returns the materialized
  * result, so the correctness gate can hash-compare against a batch
  * DuckDB oracle.
  */
object StreamingQueries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // st1: tumbling 1-hour window aggregation per event_type.
    "st1_stream_window" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val agg = StreamingOps.eventsStream(ss, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(value * 100, 0) as bigint)"))
            / 100.0).as("sum_v"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("cnt"), col("sum_v"))
      StreamingOps.runToMemory(ss, agg, "st1_stream_window", "complete")
    }),

    // st2: session windows — 30-minute inactivity gap per user.
    "st2_stream_sessions" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val agg = StreamingOps.eventsStream(ss, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (sum(expr("cast(round(value * 100, 0) as bigint)"))
            / 100.0).as("sum_v"))
        .select(
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("sess_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
            .as("sess_end"),
          col("user_id"), col("n_events"), col("sum_v"))
      StreamingOps.runToMemory(ss, agg, "st2_stream_sessions", "complete")
    }),

    // st3: incremental resume — append-mode stream of rows past the
    // last checkpointed timestamp (reference: series_service.py:415-430).
    "st3_stream_resume" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val resumed = StreamingOps.eventsStream(ss, d)
        .filter(col("ts") > to_timestamp(lit("2024-01-25 00:00:00")))
        .select("event_id", "user_id", "event_type", "value")
      StreamingOps.runToMemory(ss, resumed, "st3_stream_resume", "append")
    }),

    // st4: custom state via mapGroupsWithState — per-user profile
    // (count, max inter-event gap, last value). Update mode emits one
    // profile row per user per batch; the final profile per user is the
    // one with the highest count.
    "st4_stateful_profile" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val prof = StreamingOps.statefulProfiles(ss, d)
      StreamingOps.runToMemory(ss, prof, "st4_stateful_profile", "update")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"),
          round(max_by(col("max_gap_s"), col("n")), 6).as("max_gap_s"),
          max_by(col("last_value"), col("n")).as("last_value"))
    }),

    // st6: stream-static enrichment — the stream joins a static
    // (broadcastable) per-user profile computed from the batch table;
    // the static side is planned like any dim join.
    "st6_stream_enrich" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      // user_avg on exact cents: the integer sum is exact in double, so
      // avg and delta are bit-identical across engines with NO rounding.
      val profile = Tables.events(ss, d)
        .withColumn("cents", graft.operators.PivotOps.centsOf(col("value")))
        .groupBy(col("user_id"))
        .agg((avg(col("cents")) / lit(100.0)).as("user_avg"))
      val enriched = StreamingOps.eventsStream(ss, d)
        .filter(col("event_type") === "purchase")
        .join(profile, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("user_avg"),
          (col("value") - col("user_avg")).as("delta"))
      StreamingOps.runToMemory(ss, enriched, "st6_stream_enrich", "append")
    }),

    // st7: streaming dedup — dropDuplicates keyed on the event id holds
    // a key set in state; with unique ids the result equals batch
    // distinct, which is what the oracle checks.
    "st7_stream_dedup" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val deduped = StreamingOps.eventsStream(ss, d)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      StreamingOps.runToMemory(ss, deduped, "st7_stream_dedup", "complete")
    }),

    // st8: stream-stream inner join — purchases join clicks of the same
    // user within the trailing 5-minute window. Both sides carry
    // watermarks and the join condition bounds event time, so each
    // side's state buffer is pruned as the watermark advances — the
    // bounded-state contract that lets two 100 TB/day streams join
    // without unbounded buffering. Inner-join emission needs no
    // watermark to fire, so with AvailableNow the result equals the
    // batch interval join, which is what the oracle computes.
    "st8_stream_join" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val p = StreamingOps.eventsStream(ss, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val c = StreamingOps.eventsStream(ss, d)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("value").as("click_value"))
        .withWatermark("c_ts", "1 hour")
      val joined = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_ts") > col("p_ts") - expr("interval 5 minutes") &&
            col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("user_id"),
          date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("click_ts"),
          col("click_value"))
      StreamingOps.runToMemory(ss, joined, "st8_stream_join", "append")
    }),

    // st9: streaming CV validation — cv1's data-quality check at
    // ingest time: out-of-vocabulary terms counted per tumbling day
    // window as events arrive. The vocabulary is a broadcast STATIC
    // dim (stream-static LeftAnti), so the validity check itself never
    // shuffles the stream — only the (rare) violations reach the
    // windowed aggregation state. At 100 TB/day this is the alerting
    // feed: a schema drift or a bad producer shows up as a new term
    // in the next window.
    "st9_stream_cv" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val vocab = CvQueries.cvTerms(ss)
        .filter(col("cv_name") === "event_type_cv").select(col("term"))
      val bad = StreamingOps.eventsStream(ss, d)
        .select(col("ts"), col("event_type").as("term"))
        .filter(col("term").isNotNull)
        .join(broadcast(vocab), Seq("term"), "left_anti")
        .groupBy(window(col("ts"), "1 day"), col("term"))
        .agg(count(lit(1)).as("n_rows"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("term"), col("n_rows"))
      StreamingOps.runToMemory(ss, bad, "st9_stream_cv", "complete")
    }),

    // st5: watermarked append-mode window — only windows the watermark
    // has closed (end <= max event time - 1h) are ever emitted; the
    // in-flight tail is deliberately dropped at end of input. This is
    // the bounded-state contract a 100 TB stream relies on.
    "st5_stream_watermark" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val agg = StreamingOps.eventsStream(ss, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          (sum(expr("cast(round(value * 100, 0) as bigint)"))
            / 100.0).as("sum_v"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("cnt"), col("sum_v"))
      StreamingOps.runToMemory(ss, agg, "st5_stream_watermark", "append")
    }),

    // st10: CONTINUOUS dedup ingestion — d12's admission gate driven
    // from a file stream against the persisted LSH index artifact.
    // Arrivals replay as 3 id-ordered micro-batches; each batch runs
    // probe → gateDecisions → append on the public DedupIndex API, so
    // the final decision set equals the one-shot batch gate's and the
    // oracle is d12's SQL verbatim (the strongest possible gate for a
    // stream: its output hash-matches the batch semantics it claims).
    "st10_stream_ingest_gate" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-ingest-gate")
      DedupIndex.streamIngestGate(ss, Tables.documents(ss, d),
        "text", "doc_id", DedupQueries.K, DedupQueries.RowsPerBand,
        DedupQueries.IngestSplit, DedupQueries.IngestJacThreshold,
        nFiles = 3, root)
    }),

    // st11: continuous VECTOR ingestion — s13's admission gate driven
    // from a file stream against the persisted IVF+PQ index artifact
    // (probe under frozen quantizers → exact-cosine gate → append),
    // the embedding twin of st10. Held to s13's BATCH oracle.
    "st11_stream_vec_ingest" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-vec-ingest")
      VectorIndex.streamIngestGate(ss, Tables.embeddings(ss, d),
        SimilarityQueries.Dim, SimilarityQueries.LloydSteps,
        SimilarityQueries.PqSub, SimilarityQueries.PqSubDim,
        SimilarityQueries.PqK, SimilarityQueries.VecGateBits,
        SimilarityQueries.VecGateSplit, SimilarityQueries.VecGateThr,
        nFiles = 3, root)
    }),

    // st12: continuous CDC — x11's changelog replayed as seq-ordered
    // micro-batches maintaining a VERSIONED parquet snapshot (each
    // batch reads version N, writes N+1). Latest-wins composes across
    // seq-monotone batches, so the final snapshot is held to x11's
    // BATCH oracle.
    "st12_stream_cdc" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-cdc")
      val (base, log) = ExtraQueries.cdcFrames(ss, d)
      CdcOps.streamApply(ss, base, log, keys = Seq("o_orderkey"),
        seqCol = "seq", opCol = "op", nFiles = 2, root)
    }),

    // st16 ≡ x11/x17: continuous COPY-ON-WRITE partitioned CDC —
    // st12's chain persists a full snapshot per micro-batch; here each
    // batch reads and rewrites ONLY its churned buckets under a new
    // version directory (PartitionedCdc.streamApply), and the final
    // manifest-assembled read is held to the same one-shot batch
    // oracle. Monotone seq-ordered batches make per-bucket application
    // compose exactly as the full-snapshot chain does.
    "st16_stream_cdc_cow" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-pcdc")
      val (base, log) = ExtraQueries.cdcFrames(ss, d)
      graft.operators.PartitionedCdc.streamApply(ss, base, log,
        keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op",
        bucketOf = pmod(col("o_orderkey"), lit(16)).cast("long"),
        nFiles = 2, root = root, retainVersions = 10)
    }),

    // st14 ≡ x12: continuous materialized-view maintenance — each
    // micro-batch advances the versioned snapshot AND the versioned
    // aggregate (churn-sized delta against the pre-batch snapshot,
    // CdcOps.streamMaintain); the final aggregate version is held to
    // the batch recompute oracle.
    "st14_stream_incr_agg" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-mv")
      val (base, log) = ExtraQueries.incrAggFrames(ss, d)
      CdcOps.streamMaintain(ss, base, log, keys = Seq("o_orderkey"),
        seqCol = "seq", opCol = "op", nFiles = 2, root,
        dims = Seq("grp"), sumCols = Seq("price_tc"))
    }),

    // st17 ≡ x18/x12: continuous COW-maintained view — each
    // micro-batch advances the bucketed table (churned buckets only)
    // AND the group-sized aggregate chain; the final aggregate
    // version is held to the batch recompute oracle.
    "st17_stream_cow_mv" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-pcdc-mv")
      val (base, log) = ExtraQueries.incrAggFrames(ss, d)
      graft.operators.PartitionedCdc.streamMaintain(ss, base, log,
        keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op",
        bucketOf = pmod(col("o_orderkey"), lit(16)).cast("long"),
        nFiles = 2, root = root, dims = Seq("grp"),
        sumCols = Seq("price_tc"), retainVersions = 10)
    }),

    // st18 ≡ m5: CONTINUOUS MEDIA DECODE — the image ingest path as a
    // stream: doc ids replay as id-ordered micro-batches, each batch
    // synthesizes its fixture PNGs and runs the REAL ImageIO decode
    // stage (MultimodalOps.extractImageFeatures — bounded batches,
    // flagged fallback), appending features keyed by batch id
    // (dynamic per-batch overwrite = replay-idempotent). Decode is
    // per-row pure, so the streamed union must hash-match the
    // one-shot batch decode — m5's closed-form oracle VERBATIM.
    "st18_stream_media" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-media")
      val ids = Tables.documents(ss, d).select(col("doc_id"))
      StreamingOps.stageOrderedArrivals(ids, "doc_id", nFiles = 3,
        s"$root/arrivals")
      StreamingOps.replayOrdered(ss, ids.schema, s"$root/arrivals",
          s"$root/ckpt") { (batch, batchId) =>
        import ss.implicits._
        val media = batch.select(col("doc_id")).as[Long]
          .map(graft.operators.MultimodalOps.syntheticGrayPng _)
        graft.operators.MultimodalOps
          .extractImageFeatures(media, batchSize = 64).toDF()
          .select(col("id").as("doc_id"), col("decoded"),
            col("width"), col("height"), col("bands"),
            col("mean_lum"),
            element_at(col("grid"), 1).as("g00"),
            element_at(col("grid"), 2).as("g01"),
            element_at(col("grid"), 3).as("g10"),
            element_at(col("grid"), 4).as("g11"))
          .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
      }
      ss.read.option("basePath", s"$root/out")
        .parquet(s"$root/out").drop("batch")
    }),

    // st19 ≡ m6: st18's audio sibling — doc ids replay as id-ordered
    // micro-batches, each synthesizing its square-wave WAV fixtures
    // and running the REAL javax.sound.sampled decode stage; per-row
    // purity again makes the streamed union ≡ the one-shot batch
    // decode, so the gate is m6's closed-form oracle VERBATIM.
    "st19_stream_audio" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-audio")
      val ids = Tables.documents(ss, d).select(col("doc_id"))
      StreamingOps.stageOrderedArrivals(ids, "doc_id", nFiles = 3,
        s"$root/arrivals")
      StreamingOps.replayOrdered(ss, ids.schema, s"$root/arrivals",
          s"$root/ckpt") { (batch, batchId) =>
        import ss.implicits._
        val media = batch.select(col("doc_id")).as[Long]
          .map(graft.operators.MultimodalOps.syntheticSquareWav _)
        graft.operators.MultimodalOps
          .extractAudioFeatures(media, batchSize = 64).toDF()
          .select(col("id").as("doc_id"), col("decoded"),
            col("sample_rate"), col("channels"), col("n_samples"),
            col("duration_s"), col("rms"), col("peak"),
            col("zero_crossings"))
          .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
      }
      ss.read.option("basePath", s"$root/out")
        .parquet(s"$root/out").drop("batch")
    }),

    // st15 ≡ a12: CONTINUOUS CARDINALITY — each micro-batch appends
    // ONE HLL sketch row to a parquet sketch store (hll_sketch_agg
    // over just the batch; earlier batches are never rescanned), and
    // the corpus estimate is the union of the stored batch sketches.
    // Union state depends only on the item SET, not the batching, so
    // the streamed union must EXACTLY equal a batch 2-way union over
    // the same rows (merge_invariant) — the stream is held to a12's
    // exact-count oracle shape.
    "st15_stream_hll" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-hll")
      val li = Tables.lineitem(ss, d)
        .select(col("l_orderkey"), col("l_partkey"))
      StreamingOps.stageOrderedArrivals(li, "l_orderkey", nFiles = 3,
        s"$root/arrivals")
      StreamingOps.replayOrdered(ss, li.schema, s"$root/arrivals",
          s"$root/ckpt") { (batch, batchId) =>
        if (!batch.isEmpty)
          batch.agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
            .withColumn("batch", lit(batchId))
            .coalesce(1).write.mode("append").parquet(s"$root/sketches")
      }
      val streamed = ss.read.parquet(s"$root/sketches")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e_stream"))
      val batch2 = li
        .groupBy(pmod(col("l_orderkey"), lit(2)).as("b"))
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e_batch"))
      val exact = li.agg(countDistinct(col("l_partkey")).as("nd_part"))
      exact.crossJoin(streamed).crossJoin(batch2)
        .select(col("nd_part"),
          (col("e_stream") === col("e_batch")).as("merge_invariant"),
          (abs(col("e_stream") - col("nd_part")).cast("double")
            <= col("nd_part") * lit(0.05)).as("apx_ok"))
    }),

    // st13: CONTINUOUS TAKEDOWN — s15's delete path driven from a
    // file stream against the persisted index artifact: tombstone ids
    // replay as id-ordered micro-batches, each batch applies through
    // VectorIndex.delete (the CDC tombstone collapse rewriting only
    // the affected cells), then the artifact compacts and serves.
    // Deletion is idempotent and composes order-free across batches
    // (A∪B deleted is A deleted then B deleted), so the stream's
    // final state equals the one-shot takedown and the query is held
    // to s15's BATCH oracle — the complete streaming lifecycle:
    // ingest (st11), changelog (st12), takedown (st13).
    "st13_stream_takedown" -> ((s, d) => {
      val ss = StreamingOps.streamSession(s)
      val root = TempArtifacts.dir("graft-stream-del")
      val e = Tables.embeddings(ss, d)
      val tombs = e.select(col("vec_id"))
        .filter(pmod(col("vec_id"), lit(SimilarityQueries.VecDelMod))
          === SimilarityQueries.VecDelRes)
      // the index build and the tombstone staging touch separate
      // trees and neither reads the other's output — overlap them
      // (Par.both, the ingest gates' init rationale)
      Par.both {
        VectorIndex.build(e, SimilarityQueries.Dim,
          SimilarityQueries.LloydSteps, SimilarityQueries.PqSub,
          SimilarityQueries.PqSubDim, SimilarityQueries.PqK,
          s"$root/index")
      } {
        StreamingOps.stageOrderedArrivals(tombs, "vec_id", nFiles = 2,
          s"$root/arrivals")
      }
      StreamingOps.replayOrdered(ss, tombs.schema, s"$root/arrivals",
          s"$root/ckpt") { (batch, _) =>
        VectorIndex.delete(ss, s"$root/index", batch)
      }
      ArtifactManifest.compactGenerations(ss, s"$root/index/corpus",
        "cell")
      VectorIndex.serveTopK(VectorIndex.load(ss, s"$root/index"),
        SimilarityQueries.PqSubDim, SimilarityQueries.NQueries,
        SimilarityQueries.TopK)
    })
  )

  def oracle: Map[String, String] = Map(
    "st1_stream_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
           '%Y-%m-%d %H:%M:%S') AS win_start,
         event_type, count(*) AS cnt, sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_v
         FROM events GROUP BY 1, 2""",
    // Session semantics: a session breaks when the gap from the previous
    // event is > 30 min; Spark's session end = last event + gap.
    "st2_stream_sessions" ->
      """WITH o AS (
           SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk,
             value
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess
           FROM o)
         SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts) + INTERVAL '30 minutes',
             '%Y-%m-%d %H:%M:%S') AS sess_end,
           user_id, count(*) AS n_events, sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_v
         FROM g GROUP BY user_id, sess""",
    "st3_stream_resume" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE ts > TIMESTAMP '2024-01-25 00:00:00'""",
    "st4_stateful_profile" ->
      """WITH o AS (
           SELECT user_id, value, ts,
             (epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id))
               / 1e6 AS gap_s,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, count(*) AS n,
           round(coalesce(max(gap_s), 0.0), 6) AS max_gap_s,
           max(CASE WHEN rn = 1 THEN value END) AS last_value
         FROM o GROUP BY user_id""",
    "st6_stream_enrich" ->
      """WITH p AS (
           SELECT user_id,
             avg(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS user_avg
           FROM events GROUP BY user_id)
         SELECT e.event_id, e.user_id, e.value, p.user_avg,
           e.value - p.user_avg AS delta
         FROM events e JOIN p USING (user_id)
         WHERE e.event_type = 'purchase'""",
    "st7_stream_dedup" ->
      """SELECT event_type, count(*) AS cnt
         FROM (SELECT DISTINCT ON (event_id) event_id, event_type
               FROM events)
         GROUP BY event_type""",
    "st8_stream_join" ->
      """SELECT p.event_id AS p_id, p.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           c.value AS click_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase') p
         JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND epoch_us(c.ts) > epoch_us(p.ts) - 300000000
          AND epoch_us(c.ts) <= epoch_us(p.ts)""",
    "st9_stream_cv" -> {
      val inList = CvQueries.terms.filter(_._1 == "event_type_cv")
        .map(t => s"'${t._2}'").mkString(", ")
      s"""SELECT strftime(time_bucket(INTERVAL '1 day', ts),
            '%Y-%m-%d %H:%M:%S') AS win_start,
          event_type AS term, count(*) AS n_rows
          FROM events
          WHERE event_type IS NOT NULL AND event_type NOT IN ($inList)
          GROUP BY 1, 2"""
    },
    "st5_stream_watermark" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events)
         SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
           '%Y-%m-%d %H:%M:%S') AS win_start,
         event_type, count(*) AS cnt, sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS sum_v
         FROM events, m
         WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
           <= m.mx - INTERVAL '1 hour'
         GROUP BY 1, 2""",
    // st10 ≡ d12 and st11 ≡ s13 by construction (same gate, same
    // split): the streams are held to the BATCH oracles, not weaker
    // streaming ones.
    "st10_stream_ingest_gate" -> DedupQueries.oracle("d12_ingest_gate"),
    "st11_stream_vec_ingest" ->
      SimilarityQueries.oracle("s13_vec_ingest_gate"),
    "st12_stream_cdc" -> ExtraQueries.oracle("x11_cdc_apply"),
    "st16_stream_cdc_cow" -> ExtraQueries.oracle("x11_cdc_apply"),
    "st17_stream_cow_mv" -> ExtraQueries.oracle("x12_incr_agg"),
    // a12's oracle shape: exact distinct + pinned invariant flags
    "st15_stream_hll" ->
      """SELECT count(DISTINCT l_partkey) AS nd_part,
         true AS merge_invariant, true AS apx_ok
         FROM lineitem""",
    "st13_stream_takedown" -> SimilarityQueries.oracle("s15_index_delete"),
    "st14_stream_incr_agg" -> ExtraQueries.oracle("x12_incr_agg"),
    // decode is per-row pure: streamed batches union to exactly the
    // one-shot decode — m5's / m6's closed forms verbatim
    "st18_stream_media" -> MultimodalQueries.oracle("m5_image_decode"),
    "st19_stream_audio" -> MultimodalQueries.oracle("m6_audio_decode")
  )
}
