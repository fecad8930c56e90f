package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultimodalOps, SimilarityOps}

class SimilarityMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal → 0, parallel → 1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f))
    ).toDF("a", "b")
    val out = df.select(SimilarityOps.cosine("a", "b"))
      .as[Double].collect().toSeq
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("sign bucket encodes positive components as bits") {
    val df = Seq(Tuple1(Seq(1.0f, -1.0f, 0.5f, -0.2f, 1f, 1f, -1f, -1f)))
      .toDF("v")
    val got = df.select(SimilarityOps.signBucket("v", 8)).as[Long].head()
    assert(got === (1L | 4L | 16L | 32L)) // bits 0,2,4,5
  }

  test("feature extraction batches partitions and stays deterministic") {
    val media = (1L to 150L)
      .map(i => MultimodalOps.MediaRow(i, "text", s"payload-$i".getBytes))
      .toDS().repartition(3)
    val feats = MultimodalOps.extractFeatures(media, batchSize = 16)
      .collect().sortBy(_.id)
    assert(feats.length === 150)
    val one = feats.head
    assert(one.n_bytes === "payload-1".getBytes.length.toLong)
    assert(one.fp === MultimodalOps.hash15Jvm("payload-1".getBytes))
    assert(one.feat.length === MultimodalOps.FeatureDim)
    // float32-exact 16-bit slices of the fingerprint
    assert(one.feat(0) === ((one.fp & 0xFFFFL).toFloat / 65536.0f))
  }

  test("real image decode: PNG round-trip matches the fixture's " +
      "closed forms; corrupt and unknown payloads fall back, flagged") {
    // ids covering every geometry: w ∈ {8,16,32} × h ∈ {4,8}
    val media = (0L to 5L)
      .map(MultimodalOps.syntheticGrayPng).toDS().repartition(2)
    val feats = MultimodalOps.extractImageFeatures(media, batchSize = 2)
      .collect().sortBy(_.id)
    assert(feats.length === 6)
    for (f <- feats) {
      val (base, w, h) = ((f.id % 200).toDouble,
        (8 << (f.id % 3).toInt).toDouble, (4 << (f.id % 2).toInt).toDouble)
      assert(f.decoded && f.bands === 1)
      assert(f.width.toDouble === w && f.height.toDouble === h)
      assert(f.mean_lum === base + (w - 1) / 2 + (h - 1))
      assert(f.grid.toSeq === Seq(
        base + (w / 2 - 1) / 2 + (h / 2 - 1),
        base + w / 2 + (w / 2 - 1) / 2 + (h / 2 - 1),
        base + (w / 2 - 1) / 2 + h + (h / 2 - 1),
        base + w / 2 + (w / 2 - 1) / 2 + h + (h / 2 - 1)))
    }
    // multi-band: a 2×2 RGB PNG — luminance is the band mean
    val rgb = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xFF0000); rgb.setRGB(1, 0, 0x00FF00)
    rgb.setRGB(0, 1, 0x0000FF); rgb.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos)
    val rf = MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(9L, "image", bos.toByteArray)).get
    assert(rf.bands === 3 && rf.width === 2 && rf.height === 2)
    // pixels: (255,0,0) (0,255,0) (0,0,255) (255,255,255) → band
    // means 85, 85, 85, 255 → overall (3*85 + 255) / 4 = 127.5
    assert(rf.mean_lum === 127.5)
    assert(rf.grid.toSeq === Seq(85.0, 85.0, 85.0, 255.0))
    // corrupt payload (not an image) and a TRUNCATED real PNG: both
    // fall back to the flagged stub row instead of failing the stage
    val png = MultimodalOps.syntheticGrayPng(1L).payload
    val bad = Seq(
      MultimodalOps.MediaRow(7L, "image", "not a png".getBytes),
      MultimodalOps.MediaRow(8L, "image", png.take(png.length / 3)))
      .toDS()
    val fb = MultimodalOps.extractImageFeatures(bad, batchSize = 2)
      .collect().sortBy(_.id)
    assert(fb.forall(f => !f.decoded && f.width === 0 &&
      f.mean_lum === 0.0))
    assert(fb.head.fp ===
      MultimodalOps.hash15Jvm("not a png".getBytes))
    // ALPHA excluded: opaque black RGBA reads luminance 0 (not the
    // alpha-skewed 63.75) and bands = color components = 3
    val argb = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until 4; y <- 0 until 4) argb.setRGB(x, y, 0xFF000000)
    val abos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argb, "png", abos)
    val af = MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(20L, "image", abos.toByteArray)).get
    assert(af.bands === 3 && af.mean_lum === 0.0)
    assert(af.grid.forall(_ === 0.0))
    // DEGENERATE 1-wide image: the empty high-x quadrants report the
    // overall mean, never 0/0 = NaN
    val thin = new java.awt.image.BufferedImage(1, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8) thin.getRaster.setSample(0, y, 0, 10 * y)
    val tbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(thin, "png", tbos)
    val tf = MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(21L, "image", tbos.toByteArray)).get
    assert(!tf.grid.exists(_.isNaN))
    assert(tf.grid(1) === tf.mean_lum && tf.grid(3) === tf.mean_lum)
    assert(tf.grid(0) === 15.0 && tf.grid(2) === 55.0)
    // DECOMPRESSION-BOMB guard: a real image whose declared pixel
    // count exceeds MaxImagePixels takes the fallback, not an OOM
    val big = new java.awt.image.BufferedImage(5000, 5000,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bbos)
    assert(5000L * 5000L > MultimodalOps.MaxImagePixels)
    assert(MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(22L, "image", bbos.toByteArray)).isEmpty)
    // INDEXED-COLOR images resolve through the palette: a 2-color GIF
    // whose palette maps index 0 -> white must read BRIGHT — raw
    // raster samples are palette indices and would read 0.0
    val pal = new java.awt.image.IndexColorModel(1, 2,
      Array[Byte](-1, 0), Array[Byte](-1, 0), Array[Byte](-1, 0))
    val gif = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, pal)
    // all pixels stay index 0 = white
    val gbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gif, "gif", gbos)
    val gf = MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(23L, "image", gbos.toByteArray)).get
    assert(gf.mean_lum === 255.0,
      s"palette image read mean_lum=${gf.mean_lum} — indices, not color")
    // 16-BIT depth normalizes to the 8-bit scale: a mid-gray
    // TYPE_USHORT_GRAY PNG must not read 256x brighter than an
    // identically-toned 8-bit one
    val deep = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 4; x <- 0 until 4)
      deep.getRaster.setSample(x, y, 0, 100 << 8) // 8-bit value 100
    val dbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(deep, "png", dbos)
    val df16 = MultimodalOps.decodeImage(
      MultimodalOps.MediaRow(24L, "image", dbos.toByteArray)).get
    assert(df16.mean_lum === 100.0,
      s"16-bit image read mean_lum=${df16.mean_lum} — unscaled depth")
  }

  test("real audio decode: WAV round-trip matches the square-wave " +
      "closed forms; stereo downmixes; non-audio payloads fall back") {
    // ids covering the full geometry matrix: amp × n × rate
    val media = (0L to 9L)
      .map(MultimodalOps.syntheticSquareWav).toDS().repartition(3)
    val feats = MultimodalOps.extractAudioFeatures(media, batchSize = 4)
      .collect().sortBy(_.id)
    assert(feats.length === 10)
    for (f <- feats) {
      val (amp, n) = (100 + f.id % 900, 800 + (f.id % 5) * 400)
      val rate = 8000 << (f.id % 2).toInt
      assert(f.decoded && f.channels === 1)
      assert(f.sample_rate === rate && f.n_samples === n)
      assert(f.duration_s === n.toDouble / rate)
      assert(f.rms === amp.toDouble && f.peak === amp.toDouble)
      assert(f.zero_crossings === n - 1)
    }
    // stereo: constant 300/100 channels → per-frame mean 200, no
    // sign change → rms = peak = 200, zero crossings
    val pcm = new Array[Byte](50 * 4)
    for (i <- 0 until 50; (v, c) <- Seq((300, 0), (100, 1))) {
      pcm(4 * i + 2 * c) = (v & 0xFF).toByte
      pcm(4 * i + 2 * c + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2,
      true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 50L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val st = MultimodalOps.decodeAudio(
      MultimodalOps.MediaRow(11L, "audio", bos.toByteArray)).get
    assert(st.channels === 2 && st.n_samples === 50L)
    assert(st.rms === 200.0 && st.peak === 200.0)
    assert(st.zero_crossings === 0L)
    // non-audio payloads (garbage, and a PNG) fall back flagged
    val bad = Seq(
      MultimodalOps.MediaRow(12L, "audio", "not audio".getBytes),
      MultimodalOps.MediaRow(13L, "audio",
        MultimodalOps.syntheticGrayPng(1L).payload)).toDS()
    val fb = MultimodalOps.extractAudioFeatures(bad, batchSize = 2)
      .collect().sortBy(_.id)
    assert(fb.forall(f => !f.decoded && f.sample_rate === 0 &&
      f.rms === 0.0))
    // NON-LINEAR PCM the stack CAN parse (ULAW WAV): falls back
    // rather than mis-reading companded bytes as linear samples
    val upcm = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val ufmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val ubos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(upcm), ufmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, ubos)
    assert(MultimodalOps.decodeAudio(
      MultimodalOps.MediaRow(14L, "audio", ubos.toByteArray)).isEmpty)
  }

  test("video composition: frame-sample then real per-frame decode — " +
      "padding invisible, sampled frames decode to their fixture's " +
      "closed forms") {
    val vids = Seq(3L, 7L)
      .map(MultimodalOps.syntheticVideo(_, frames = 4,
        frameBytes = 1024)).toDS()
    val sampled = MultimodalOps.sampleFrames(vids, frameBytes = 1024,
      stride = 2)
    val feats = MultimodalOps.extractImageFeatures(sampled,
      batchSize = 4).collect().sortBy(_.id)
    // 2 docs × frames {0, 2}
    assert(feats.map(_.id).toSeq ===
      Seq(3000000L, 3000002L, 7000000L, 7000002L))
    for (f <- feats) {
      val fid = (f.id / 1000000L) * 10 + (f.id % 1000000L)
      val (base, w, h) = ((fid % 200).toDouble,
        (8 << (fid % 3).toInt).toDouble, (4 << (fid % 2).toInt).toDouble)
      assert(f.decoded, s"frame ${f.id} (fixture $fid) did not decode")
      assert(f.width.toDouble === w && f.height.toDouble === h)
      assert(f.mean_lum === base + (w - 1) / 2 + (h - 1))
    }
  }

  test("frame sampling keeps every stride-th fixed-size slice") {
    val media = Seq(MultimodalOps.MediaRow(1L, "video",
      Array.tabulate[Byte](100)(_.toByte))).toDS()
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 10,
      stride = 2).collect().sortBy(_.id)
    assert(frames.length === 5) // slices 0,2,4,6,8 of 10
    assert(frames.head.payload.toSeq === (0 until 10).map(_.toByte))
    assert(frames(1).payload.toSeq === (20 until 30).map(_.toByte))
  }

  private val sf = "/root/testdata/sf0.001"

  test("decontamination flags only non-benchmark docs, with real hits") {
    val out = SparkEntry.queries("d10_decontaminate")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(out.forall { case (id, _) => id % 20 != 7 },
      "a benchmark doc flagged itself")
    assert(out.forall(_._2 >= 1L))
  }

  test("source mixing fills each quota exactly and never exceeds T") {
    val out = SparkEntry.queries("x7_source_mix")(spark, sf)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // quotas: floor(100 * isqrt(c_s) / sum isqrt) docs per source,
    // rank-filled — per-source output size must equal its quota
    val counts = Tables.documents(spark, sf)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val isq = counts.view.mapValues(c => math.sqrt(c.toDouble).toLong).toMap
    val tot = isq.values.sum
    isq.foreach { case (s, q) =>
      val quota = math.min(100L * q / tot, counts(s))
      assert(out.getOrElse(s, 0L) === quota, s"source $s")
    }
    assert(out.values.sum <= 100L)
  }

  test("ANN recall gate: one row per query, recall in [0,1] as n/k") {
    val rows = SparkEntry.queries("s6_ann_recall")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1).sorted === (0L until 5L))
    rows.foreach { case (_, n, r) =>
      assert(n >= 0L && n <= 3L)
      assert(math.abs(r - math.floor(n * 1000000.0 / 3) / 1e6) < 1e-12)
    }
  }

  test("filtered ANN equals an independently composed filter + ADC rank") {
    // s12 folds the label predicate into the (cell, label) join key,
    // stages per-query ADC tables on the broadcast side, and ranks
    // with the sort-free TopKMin aggregator. Recompute it through a
    // DIFFERENT composition — driver-side query vectors scored by the
    // direct pq_adc form, a post-join label/cell row filter, and a
    // row_number window — and require identical rows.
    import graft.operators.ProductQuantization
    val (dim, steps, sub, subDim, k, nq, topK) = (64, 2, 8, 8, 16, 5, 3)
    val got = SparkEntry.queries("s12_filtered_ann")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Long)].collect().toSeq.sorted
    val e = SimilarityOps.withNorm(
      Tables.embeddings(spark, sf), "embedding", "n")
    val cents = SimilarityOps.trainIvf(e, dim, steps)
    val books = ProductQuantization.train(
      e, "embedding", "vec_id", sub, subDim, k, steps = 1)
    val assigned = e.withColumn("cell",
      SimilarityOps.ivfAssign(cents, dim))
    val enc = ProductQuantization.encode(
      assigned, "embedding", books, subDim, "code")
    val queries = assigned.filter(col("vec_id") < nq)
      .select(col("vec_id"), col("embedding"), col("cell"),
        col("label").cast("long").as("label"))
      .collect().sortBy(_.getLong(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("adc_dist").asc, col("vec_id").asc)
    val expected = queries.flatMap { qr =>
      val qv = qr.getSeq[Float](1).toArray.map(_.toDouble)
      enc.filter(col("cell") === qr.getLong(2) &&
          col("label").cast("long") === qr.getLong(3) &&
          col("vec_id") =!= qr.getLong(0))
        .select(col("vec_id"),
          round(ProductQuantization.adcDistance(col("code"), qv, books,
            subDim), 6).as("adc_dist"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= topK)
        .select(lit(qr.getLong(0)).as("q_id"), col("vec_id"),
          lit(qr.getLong(3)).as("label"), lit(qr.getLong(2)).as("cell"),
          col("adc_dist"), col("rank"))
        .as[(Long, Long, Long, Long, Double, Long)].collect()
    }.toSeq.sorted
    assert(got === expected)
    // the predicate actually bites: some query has fewer same-label
    // candidates than its whole cell (else the filter tested nothing)
    val unfiltered = SparkEntry.queries("s8_ivfpq_topk")(spark, sf)
      .select(col("q_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got.map(r => (r._1, r._2)).toSeq !== unfiltered)
  }
}
