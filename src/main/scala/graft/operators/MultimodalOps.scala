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
  * 2×2 luminance grid), and so is WAV/PCM AUDIO decode
  * ([[decodeAudio]] — `javax.sound.sampled`, also JDK-shipped: rate /
  * channels / duration, RMS, peak, zero crossings), each with a
  * deterministic flagged fallback row for payloads the JDK stack
  * cannot read. COMPRESSED audio (mp3/aac) and VIDEO codecs are not in
  * this container, so their decode remains the documented stub:
  * [[decodeStub]] derives
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
    * Component i is the 16-bit window of the fingerprint starting at
    * bit 4·i, divided by 2^16 — a 4-bit STRIDE, so adjacent
    * components overlap deliberately: hash15 yields 60 bits, and a
    * disjoint 16-bit stride would push every component past the
    * fourth outside the fingerprint (always zero). Each value is
    * exactly representable in float32, so downstream double
    * arithmetic is bit-stable; the m2-m4 oracles replicate this exact
    * windowing.
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

  /** An image whose DECLARED pixel count exceeds this takes the
    * flagged fallback instead of being decoded: ImageIO allocates
    * width × height × bands bytes up front, so a few-KB crafted
    * header declaring 50000×50000 would OOM the executor (an Error,
    * not caught by NonFatal) — the classic decompression bomb. 16.7M
    * pixels ≈ 64 MB RGBA, comfortably inside a task's working memory
    * at the default batch size.
    */
  val MaxImagePixels: Long = 1L << 24

  /** Decode an image payload with `javax.imageio` (PNG/JPEG/BMP/GIF —
    * the readers the JDK ships; no new dependency). The declared
    * dimensions are read from the HEADER first and checked against
    * [[MaxImagePixels]] before any pixel allocation. Luminance of a
    * pixel is the mean of its COLOR bands — the alpha channel (last
    * raster band when the color model carries one) is excluded, so an
    * opaque black RGBA pixel reads 0, not 63.75 — and `bands` reports
    * color components. Statistics accumulate integer sample sums
    * scaled by the color-band count, so single-band means are exact
    * integer ratios — bit-stable across partitionings. `None` for
    * anything ImageIO cannot read (no reader for the bytes, corrupt
    * stream, over-budget dimensions) — the caller's flagged fallback.
    */
  def decodeImage(row: MediaRow): Option[ImageFeatures] = {
    val img =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val (w, h) =
                (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
              if (w <= 0 || h <= 0 || w * h > MaxImagePixels) None
              else Option(reader.read(0))
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    img.map { bi0 =>
      // INDEXED-COLOR images (GIF, palette PNG/BMP) store palette
      // INDICES in the raster — a luminance computed from raw samples
      // would be the mean palette index, not brightness (an all-white
      // 2-color GIF could read as 0.0). Resolve through the palette
      // by converting to RGB first; transparency flattens to black
      // (the conversion's default), which the fingerprint still
      // distinguishes.
      val bi =
        if (bi0.getColorModel.isInstanceOf[
            java.awt.image.IndexColorModel]) {
          val conv = new java.awt.image.BufferedImage(bi0.getWidth,
            bi0.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = conv.createGraphics()
          try g.drawImage(bi0, 0, 0, null) finally g.dispose()
          conv
        } else bi0
      val (w, h) = (bi.getWidth, bi.getHeight)
      val raster = bi.getRaster
      // color bands only: standard BufferedImage rasters order color
      // components first with alpha LAST, and getNumColorComponents
      // counts just the color ones (3 for RGBA, 1 for gray+alpha)
      val bands = math.min(bi.getColorModel.getNumColorComponents,
        raster.getNumBands)
      // normalize sample depth to the 8-bit scale: the JDK PNG reader
      // yields 16-bit rasters for 16-bit PNGs, and an unscaled mean
      // would sit 256x above an identically-toned 8-bit image's.
      // Right-shift keeps the statistics integer-exact; 8-bit inputs
      // (every oracle fixture) shift by zero — bit-identical
      val shifts = Array.tabulate(bands)(b => math.max(0,
        raster.getSampleModel.getSampleSize(b) - 8))
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
          while (b < bands) {
            s += raster.getSample(x, y, b) >> shifts(b); b += 1
          }
          val c = gy * 2 + (if (2 * x >= w) 1 else 0)
          cellSum(c) += s
          cellN(c) += 1
          total += s
          x += 1
        }
        y += 1
      }
      val db = bands.toDouble
      val mean = total.toDouble / (w.toLong * h * bands)
      ImageFeatures(row.id, row.kind, row.payload.length.toLong,
        hash15Jvm(row.payload), decoded = true, w, h, bands, mean,
        // a 1-wide/1-tall image leaves its high quadrants empty
        // (cellN 0) — report the overall mean there, never 0/0 = NaN
        // poisoning downstream grid comparisons
        Array.tabulate(4)(c =>
          if (cellN(c) == 0) mean
          else cellSum(c).toDouble / (cellN(c) * db)))
    }
  }

  /** The one bounded-batch `mapPartitions` stage every media
    * extractor runs through — the mapInPandas shape: the iterator is
    * consumed in `batchSize` groups so peak task memory is
    * batch × max payload, independent of partition size; a real
    * native codec would process each group in one call.
    */
  private def extractBatched[T](ds: Dataset[MediaRow], batchSize: Int)(
      perRow: MediaRow => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
    ds.mapPartitions(it =>
      it.grouped(batchSize).flatMap(_.map(perRow)))

  /** Batched image feature extraction — the bounded-batch stage with
    * the REAL decode in the batch body and the deterministic fallback
    * row for payloads ImageIO cannot read.
    */
  def extractImageFeatures(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    extractBatched(ds, batchSize)(r =>
      decodeImage(r).getOrElse(ImageFeatures(r.id, r.kind,
        r.payload.length.toLong, hash15Jvm(r.payload),
        decoded = false, 0, 0, 0, 0.0, Array.fill(4)(0.0))))
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

  /** REAL audio decode output (WAV/PCM via `javax.sound.sampled`,
    * which the JDK ships like ImageIO): container format, per-channel
    * sample statistics a filtering pipeline keys on — RMS and peak
    * amplitude (clipping / silence gates), zero-crossing count (a
    * crude spectral proxy), duration. `decoded = false` marks the
    * flagged fallback row of a payload the sound stack cannot read
    * (compressed codecs — mp3/aac — are NOT in the JDK and stay
    * stubbed, exactly as image decode treats unknown formats).
    */
  final case class AudioFeatures(id: Long, kind: String, n_bytes: Long,
      fp: Long, decoded: Boolean, sample_rate: Int, channels: Int,
      n_samples: Long, duration_s: Double, rms: Double, peak: Double,
      zero_crossings: Long)

  /** Decode an audio payload with `javax.sound.sampled`. Supports the
    * LINEAR PCM frame layouts the JDK WAV reader emits (8/16-bit,
    * signed or unsigned, any channel count, either endianness);
    * anything else the stack can parse but NOT as linear PCM —
    * ULAW/ALAW WAVs, compressed AU — takes the flagged fallback
    * instead of being mis-read as linear samples. Samples fold to a
    * per-frame MEAN across channels before the statistics, so mono
    * fixtures stay integer-exact. `None` for anything the stack
    * cannot parse (it throws `UnsupportedAudioFileException` on
    * non-audio bytes).
    */
  def decodeAudio(row: MediaRow): Option[AudioFeatures] = {
    import javax.sound.sampled.AudioFormat.Encoding
    val in =
      try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(row.payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    in.flatMap { ais =>
      try {
        val f = ais.getFormat
        val bits = f.getSampleSizeInBits
        val ch = f.getChannels
        val signed = f.getEncoding == Encoding.PCM_SIGNED
        // linear PCM only: companded (ULAW/ALAW) or float frames
        // interpreted as integers would yield garbage under
        // decoded=true — the one thing worse than not decoding
        if (!(signed || f.getEncoding == Encoding.PCM_UNSIGNED) ||
            (bits != 8 && bits != 16)) None
        else {
          val bytes = ais.readAllBytes()
          val bytesPerSample = bits / 8
          val frameBytes = bytesPerSample * ch
          val nFrames = bytes.length / frameBytes
          def sampleAt(off: Int): Int =
            if (bits == 8) {
              // 8-bit PCM: unsigned center-128 (the WAV convention)
              // or plain signed bytes (AIFF) — per the ENCODING, not
              // an assumption
              if (signed) bytes(off).toInt
              else (bytes(off) & 0xFF) - 128
            } else {
              val (lo, hi) =
                if (f.isBigEndian) (off + 1, off) else (off, off + 1)
              val raw = (bytes(hi).toInt << 8) | (bytes(lo) & 0xFF)
              if (signed) raw else (raw & 0xFFFF) - 32768
            }
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0L
          var prevSign = 0
          var i = 0
          while (i < nFrames) {
            // per-frame channel mean: integer for mono, the natural
            // downmix otherwise — and peak uses the SAME mean, so
            // peak >= rms always holds (an integer-truncated peak
            // could read below the rms of a constant signal)
            var s = 0L
            var c = 0
            while (c < ch) {
              s += sampleAt(i * frameBytes + c * bytesPerSample)
              c += 1
            }
            val v = s.toDouble / ch
            sumSq += v * v
            val av = math.abs(v)
            if (av > peak) peak = av
            val sign = java.lang.Double.compare(v, 0.0).sign
            if (sign != 0 && prevSign != 0 && sign != prevSign)
              crossings += 1
            if (sign != 0) prevSign = sign
            i += 1
          }
          val rate = math.round(f.getSampleRate).toInt
          // a corrupt/crafted header can declare sample rate 0 (or a
          // fraction rounding to 0) and still parse — duration would
          // be Infinity/NaN under decoded=true, poisoning downstream
          // filters; route it to the flagged fallback instead (same
          // trust-no-declared-geometry stance as MaxImagePixels)
          if (rate <= 0) None
          else Some(AudioFeatures(row.id, row.kind,
            row.payload.length.toLong, hash15Jvm(row.payload),
            decoded = true, rate, ch, nFrames,
            nFrames.toDouble / rate,
            if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames),
            peak, crossings))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally ais.close()
    }
  }

  /** Batched audio feature extraction — same bounded-batch stage
    * shape as [[extractImageFeatures]], flagged fallback included.
    */
  def extractAudioFeatures(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    extractBatched(ds, batchSize)(r =>
      decodeAudio(r).getOrElse(AudioFeatures(r.id, r.kind,
        r.payload.length.toLong, hash15Jvm(r.payload),
        decoded = false, 0, 0, 0L, 0.0, 0.0, 0.0, 0L)))
  }

  /** Deterministic synthetic square-wave WAV — the audio analogue of
    * [[syntheticGrayPng]]: 16-bit mono PCM alternating +A/-A with
    * `A = 100 + id%900`, `n = 800 + (id%5)*400` samples at
    * `8000 << (id%2)` Hz, so every decoded statistic is closed-form:
    * RMS = peak = A exactly (sqrt of a perfect square), zero
    * crossings = n-1 (every adjacent pair flips sign), duration =
    * n / rate (power-of-two rate — exact double).
    */
  def syntheticSquareWav(id: Long): MediaRow = {
    val amp = (100 + id % 900).toInt
    val n = (800 + (id % 5) * 400).toInt
    val rate = (8000 << (id % 2).toInt).toFloat
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if (i % 2 == 0) amp else -amp
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1,
      true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    MediaRow(id, "audio", bos.toByteArray)
  }

  /** Deterministic synthetic "video": `frames` fixture PNGs
    * ([[syntheticGrayPng]] of `id*10 + frameIdx`), each zero-padded
    * to the fixed `frameBytes` window — the motion-JPEG-like shape
    * [[sampleFrames]] slices (PNG decoders stop at the IEND chunk, so
    * the padding is invisible to [[decodeImage]]). Composes the full
    * video path: container slice → frame sample → REAL per-frame
    * decode, every statistic still closed-form in (id, frameIdx).
    */
  def syntheticVideo(id: Long, frames: Int,
      frameBytes: Int): MediaRow = {
    val payload = new Array[Byte](frames * frameBytes)
    var i = 0
    while (i < frames) {
      val png = syntheticGrayPng(id * 10 + i).payload
      require(png.length <= frameBytes,
        s"syntheticVideo: frame PNG ${png.length} B exceeds the " +
          s"$frameBytes B frame window")
      System.arraycopy(png, 0, payload, i * frameBytes, png.length)
      i += 1
    }
    MediaRow(id, "video", payload)
  }

  /** Batched stub feature extraction — the bounded-batch stage with
    * the deterministic pseudo-decode.
    */
  def extractFeatures(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    extractBatched(ds, batchSize)(decodeStub)
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
