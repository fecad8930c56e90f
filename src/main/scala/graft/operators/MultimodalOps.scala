package graft.operators


import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) column handling: media payloads are
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a typed `mapPartitions` over fixed-size batches —
  * the Scala analogue of a Pandas-UDF `mapInPandas` stage: the iterator
  * is consumed in bounded groups so peak memory per task is
  * `batchSize × max payload`, independent of partition size.
  *
  * IMAGE decode is REAL ([[decodeImage]] — `javax.imageio`, which the
  * JDK ships: PNG/JPEG/BMP/GIF dimensions, band count, mean luminance,
  * 2×2 luminance grid), with a deterministic fallback row for payloads
  * ImageIO cannot read. AUDIO/VIDEO codecs are not in this container,
  * so their decode remains the documented stub: [[decodeStub]] derives
  * a deterministic pseudo-feature vector from the payload's md5 — the
  * Spark-side plumbing (schema, batching, partitioning, feature shape)
  * is real and tested, and a production build swaps [[decodeStub]] for
  * a JNI/codec call with the same signature.
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

  /** REAL image decode output: dimensions, band count, mean luminance,
    * and a 2×2 downsampled luminance grid (`grid(gy*2+gx)` = the mean
    * luminance of that quadrant) — the fixed-width feature shape a
    * training-data pipeline filters and clusters on. `decoded = false`
    * marks the fallback row of a payload [[decodeImage]] could not
    * read (unknown format, corrupt bytes): dimensions zero, features
    * zero, fingerprint still real — the pipeline keeps the row and
    * can route it by the flag instead of losing it.
    */
  final case class ImageFeatures(id: Long, kind: String, n_bytes: Long,
      fp: Long, decoded: Boolean, width: Int, height: Int, bands: Int,
      mean_lum: Double, grid: Array[Double])

  /** Decode an image payload with `javax.imageio` (PNG/JPEG/BMP/GIF —
    * the readers the JDK ships; no new dependency). Luminance of a
    * pixel is its band MEAN (= the sample itself for grayscale), and
    * every statistic accumulates integer sample sums scaled by the
    * band count, so single-band means are exact integer ratios —
    * bit-stable across partitionings. `None` for anything ImageIO
    * cannot read: it returns null on unknown formats and throws on
    * corrupt streams, both mapped here to the caller's fallback.
    */
  def decodeImage(row: MediaRow): Option[ImageFeatures] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { bi =>
      val (w, h) = (bi.getWidth, bi.getHeight)
      val raster = bi.getRaster
      val bands = raster.getNumBands
      // band-summed integer accumulators: total plus one per 2×2 cell
      // (quadrant split at the integer midpoint — odd dims put the
      // extra row/column in the low cell)
      val cellSum = new Array[Long](4)
      val cellN = new Array[Long](4)
      var total = 0L
      var y = 0
      while (y < h) {
        val gy = if (2 * y >= h) 1 else 0
        var x = 0
        while (x < w) {
          var s = 0L
          var b = 0
          while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
          val c = gy * 2 + (if (2 * x >= w) 1 else 0)
          cellSum(c) += s
          cellN(c) += 1
          total += s
          x += 1
        }
        y += 1
      }
      val db = bands.toDouble
      ImageFeatures(row.id, row.kind, row.payload.length.toLong,
        hash15Jvm(row.payload), decoded = true, w, h, bands,
        total.toDouble / (w.toLong * h * bands),
        Array.tabulate(4)(c => cellSum(c).toDouble / (cellN(c) * db)))
    }
  }

  /** Batched image feature extraction — the same bounded-batch
    * mapPartitions stage as [[extractFeatures]], with the REAL decode
    * in the batch body and the deterministic fallback row for
    * payloads ImageIO cannot read.
    */
  def extractImageFeatures(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          decodeImage(r).getOrElse(ImageFeatures(r.id, r.kind,
            r.payload.length.toLong, hash15Jvm(r.payload),
            decoded = false, 0, 0, 0, 0.0, Array.fill(4)(0.0)))
        }
      }
    }
  }

  /** Deterministic synthetic grayscale PNG — the oracle fixture for
    * the real decode path: `pixel(x, y) = id%200 + x + 2y` over a
    * power-of-two geometry (width 8/16/32 by `id%3`, height 4/8 by
    * `id%2`; max sample 199+31+14 < 256), so every decoded statistic
    * is a closed form of `id` with exactly-representable .5 fractions
    * (sums divide by power-of-two pixel counts) — DuckDB predicts the
    * decode arithmetically while the engine really round-trips
    * ImageIO PNG bytes.
    */
  def syntheticGrayPng(id: Long): MediaRow = {
    val base = (id % 200).toInt
    val w = 8 << (id % 3).toInt
    val h = 4 << (id % 2).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, base + x + 2 * y)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    MediaRow(id, "image", bos.toByteArray)
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
