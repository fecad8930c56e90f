package graft.operators


import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) column handling: media payloads are
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a typed `mapPartitions` over fixed-size batches —
  * the Scala analogue of a Pandas-UDF `mapInPandas` stage: the iterator
  * is consumed in bounded groups so peak memory per task is
  * `batchSize × max payload`, independent of partition size.
  *
  * THE DECODE ITSELF IS A STUB: this container has no image/audio
  * codecs, so [[decodeStub]] derives a deterministic pseudo-feature
  * vector from the payload's md5 — the Spark-side plumbing (schema,
  * batching, partitioning, feature shape) is real and tested, and a
  * production build swaps [[decodeStub]] for a JNI/codec call with the
  * same signature.
  */
object MultimodalOps {

  /** One media row: opaque payload + minimal typed metadata. */
  final case class MediaRow(id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: byte size, 60-bit content fingerprint, and a
    * fixed-width feature vector.
    */
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      fp: Long, feat: Array[Float])

  val FeatureDim = 4

  /** JVM twin of [[TextOps.hash15]]: first 15 hex chars of md5, base 16.
    * (Values match Spark's `conv(substring(md5(x),1,15),16,10)` and
    * DuckDB's `('0x' || substr(md5(x),1,15))::BIGINT` exactly.)
    */
  def hash15Jvm(bytes: Array[Byte]): Long =
    // one implementation of the cross-engine hash primitive: delegate
    // to ShingleOps.hash15 (ThreadLocal digest + bit packing) instead
    // of a per-row MessageDigest lookup, 16 format-string allocations,
    // and a hex parse that computed the identical value
    graft.functions.ShingleOps.hash15(bytes)

  /** STUB decode: deterministic pseudo-features from the content hash.
    * Each component is a 16-bit slice of the fingerprint divided by
    * 2^16 — exactly representable in float32, so downstream double
    * arithmetic is bit-stable.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val fp = hash15Jvm(row.payload)
    val feat = Array.tabulate(FeatureDim) { i =>
      (((fp >> (4 * i)) & 0xFFFFL).toFloat / 65536.0f)
    }
    MediaFeatures(row.id, row.kind, row.payload.length.toLong, fp, feat)
  }

  /** Batched feature extraction — the mapInPandas-shaped stage. */
  def extractFeatures(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = the decoder's working set; a real codec
        // would decode the whole batch in one native call here.
        batch.map(decodeStub)
      }
    }
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * fixed-size frame slice of the payload. The slicing is real; frame
    * decode would replace identity.
    */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (frame, i) if i % stride == 0 =>
          MediaRow(r.id * 1000000L + i, r.kind, frame)
        }
    }
  }
}
