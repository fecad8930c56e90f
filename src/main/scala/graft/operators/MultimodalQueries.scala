package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal inventory: the documents table's text re-encoded as an
  * opaque binary payload exercises the full media path — binary
  * columns, metadata, and the batched mapPartitions feature extraction
  * (with its deterministic stub decode), all oracle-checkable because
  * the stub derives features from md5.
  */
object MultimodalQueries {
  import Tables._

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m2: binary payload metadata — byte length + content digest.
    "m2_binary_meta" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))),

    // m4: frame sampling — video-shaped payloads sliced into fixed
    // 64-byte frames, every 2nd kept (the decode-free part of a
    // frame-sample stage; a codec would decode each kept frame). The
    // oracle slices with char substr — a PRECONDITION of single-byte
    // (ASCII) text, which no other gate asserts: multi-byte text would
    // keep m2 green (it compares bytes to bytes) while m4's char
    // slices diverge from the engine's byte slices. NULL text rows are
    // filtered on BOTH sides: a null payload has no frames (and would
    // NPE the typed flatMap).
    "m4_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("id"), lit("video").as("kind"),
          col("text").cast("binary").as("payload"))
        .as[MultimodalOps.MediaRow]
      MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 2)
        .toDF()
        .select(col("id").as("frame_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("frame_md5"))
    }),

    // m3: batched typed feature extraction (mapPartitions stage) over
    // binary payloads; features are exact float32 values so the double
    // oracle matches bit-for-bit.
    "m3_media_features" -> ((s, d) => {
      import s.implicits._
      val media = documents(s, d)
        .filter(col("text").isNotNull) // null payload: nothing to decode
        .select(col("doc_id").as("id"), lit("text").as("kind"),
          col("text").cast("binary").as("payload"))
        .as[MultimodalOps.MediaRow]
      MultimodalOps.extractFeatures(media, batchSize = 64)
        .toDF()
        .select(col("id").as("doc_id"), col("n_bytes"), col("fp"),
          element_at(col("feat"), 1).cast("double").as("feat0"),
          element_at(col("feat"), 2).cast("double").as("feat1"))
    }),

    // m5: REAL image decode — per doc_id a deterministic synthetic
    // grayscale PNG ([[MultimodalOps.syntheticGrayPng]]) is ENCODED
    // then DECODED through javax.imageio in the bounded-batch stage;
    // dimensions, band count, mean luminance and the 2×2 luminance
    // grid must equal the oracle's closed forms (the fixture's pixel
    // function makes every statistic arithmetic in doc_id, and the
    // power-of-two geometry keeps each mean exactly representable).
    // A decode failure would flip `decoded` and zero the stats — any
    // regression in the decode path is a hash mismatch, not a skip.
    "m5_image_decode" -> ((s, d) => {
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long]
        .map(MultimodalOps.syntheticGrayPng _)
      MultimodalOps.extractImageFeatures(media, batchSize = 64)
        .toDF()
        .select(col("id").as("doc_id"), col("decoded"), col("width"),
          col("height"), col("bands"), col("mean_lum"),
          element_at(col("grid"), 1).as("g00"),
          element_at(col("grid"), 2).as("g01"),
          element_at(col("grid"), 3).as("g10"),
          element_at(col("grid"), 4).as("g11"))
    }),

    // m6: REAL audio decode — per doc_id a deterministic square-wave
    // WAV ([[MultimodalOps.syntheticSquareWav]]) is ENCODED then
    // DECODED through javax.sound.sampled; rate, channel count,
    // sample count, duration, RMS, peak, and zero-crossing count must
    // equal the oracle's closed forms (the square wave makes RMS a
    // perfect-square sqrt and the power-of-two rate makes duration an
    // exact double). Same hash-mismatch-on-regression property as m5.
    "m6_audio_decode" -> ((s, d) => {
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long]
        .map(MultimodalOps.syntheticSquareWav _)
      MultimodalOps.extractAudioFeatures(media, batchSize = 64)
        .toDF()
        .select(col("id").as("doc_id"), col("decoded"),
          col("sample_rate"), col("channels"), col("n_samples"),
          col("duration_s"), col("rms"), col("peak"),
          col("zero_crossings"))
    }),

    // m7: the VIDEO path composed end to end — per doc_id a synthetic
    // 4-frame "video" (fixture PNGs in fixed 1 KiB frame windows,
    // motion-JPEG shape), frame-sampled every 2nd frame (m4's slicing
    // stage) and each kept frame REALLY decoded through ImageIO (m5's
    // stage). Frame f of doc v carries fixture id v*10+f, so every
    // decoded statistic is still a closed form of (doc_id, frame).
    "m7_video_frames" -> ((s, d) => {
      import s.implicits._
      val vids = documents(s, d).select(col("doc_id")).as[Long]
        .map(MultimodalOps.syntheticVideo(_, frames = 4,
          frameBytes = 1024))
      val sampled = MultimodalOps.sampleFrames(vids,
        frameBytes = 1024, stride = 2)
      MultimodalOps.extractImageFeatures(sampled, batchSize = 64)
        .toDF()
        .select(col("id").as("frame_id"), col("decoded"),
          col("width"), col("height"), col("bands"), col("mean_lum"))
    })
  )

  def oracle: Map[String, String] = Map(
    "m2_binary_meta" ->
      """SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS content_md5,
         ascii(substr(text, 1, 1)) AS first_byte
         FROM documents""",
    "m4_frame_sample" ->
      """WITH fr AS (
           SELECT doc_id, text,
             unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)))
               AS i
           FROM documents WHERE text IS NOT NULL)
         SELECT doc_id * 1000000 + i AS frame_id,
           length(substr(text, CAST(i * 64 + 1 AS INTEGER), 64))
             AS n_bytes,
           md5(substr(text, CAST(i * 64 + 1 AS INTEGER), 64))
             AS frame_md5
         FROM fr WHERE i % 2 = 0""",
    "m3_media_features" ->
      """WITH f AS (
           SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
           FROM documents WHERE text IS NOT NULL)
         SELECT doc_id, n_bytes, fp,
           CAST((fp >> 0) & 65535 AS DOUBLE) / 65536.0 AS feat0,
           CAST((fp >> 4) & 65535 AS DOUBLE) / 65536.0 AS feat1
         FROM f""",
    // closed forms of the synthetic fixture's decoded statistics:
    // pixel(x,y) = base + x + 2y over w×h, so the mean adds the x and
    // y series means, and quadrant (gy,gx) shifts by gx*w/2 (x series)
    // and gy*h (the 2y series) — every value a .5-exact double
    "m5_image_decode" ->
      """WITH p AS (
           SELECT doc_id, doc_id % 200 AS base,
             CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
               ELSE 32 END AS w,
             CASE doc_id % 2 WHEN 0 THEN 4 ELSE 8 END AS h
           FROM documents)
         SELECT doc_id, true AS decoded,
           w AS width, h AS height, 1 AS bands,
           base + (w - 1) / 2.0 + (h - 1) AS mean_lum,
           base + (w/2 - 1) / 2.0 + (h/2 - 1) AS g00,
           base + w/2 + (w/2 - 1) / 2.0 + (h/2 - 1) AS g01,
           base + (w/2 - 1) / 2.0 + h + (h/2 - 1) AS g10,
           base + w/2 + (w/2 - 1) / 2.0 + h + (h/2 - 1) AS g11
         FROM p""",
    // the square-wave fixture's decoded statistics in closed form:
    // amplitude A = 100 + id%900 alternating sign each sample, so
    // RMS = peak = A, every adjacent pair crosses zero (n-1), and
    // duration divides by a power-of-two rate exactly
    "m6_audio_decode" ->
      """WITH p AS (
           SELECT doc_id,
             100 + doc_id % 900 AS amp,
             800 + (doc_id % 5) * 400 AS n,
             CASE doc_id % 2 WHEN 0 THEN 8000 ELSE 16000 END AS rate
           FROM documents)
         SELECT doc_id, true AS decoded,
           rate AS sample_rate, 1 AS channels,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n AS DOUBLE) / rate AS duration_s,
           CAST(amp AS DOUBLE) AS rms,
           CAST(amp AS DOUBLE) AS peak,
           CAST(n - 1 AS BIGINT) AS zero_crossings
         FROM p""",
    // frame f of doc v is fixture id v*10+f; sampleFrames keeps
    // frames 0 and 2 (stride 2 of 4) and re-keys to v*1000000+f —
    // the per-frame decode statistics are m5's closed forms over the
    // frame's fixture id
    "m7_video_frames" ->
      """WITH fr AS (
           SELECT doc_id, i
           FROM documents CROSS JOIN (VALUES (0), (2)) AS s(i)),
         q AS (
           SELECT doc_id, i,
             (doc_id * 10 + i) % 200 AS base,
             CASE (doc_id * 10 + i) % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
               ELSE 32 END AS w,
             CASE (doc_id * 10 + i) % 2 WHEN 0 THEN 4 ELSE 8 END AS h
           FROM fr)
         SELECT doc_id * 1000000 + i AS frame_id, true AS decoded,
           w AS width, h AS height, 1 AS bands,
           base + (w - 1) / 2.0 + (h - 1) AS mean_lum
         FROM q"""
  )
}
