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
}
