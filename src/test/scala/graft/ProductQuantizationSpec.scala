package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantization

/** Product quantization: determinism, compression shape, Lloyd-step
  * improvement, reconstruction-error sanity, and ADC recall on a
  * clustered synthetic corpus.
  */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  // 16-dim vectors, 4 subspaces x 4 dims, 8 centroids each
  private val Sub = 4
  private val SubDim = 4
  private val K = 8

  // 4 well-separated cluster centers + deterministic per-vector jitter
  private def corpus = {
    val centers = Array(
      Array.fill(16)(0.0), Array.fill(16)(5.0),
      Array.tabulate(16)(i => if (i % 2 == 0) 5.0 else 0.0),
      Array.tabulate(16)(i => if (i % 2 == 0) 0.0 else 5.0))
    (0 until 200).map { id =>
      val c = centers(id % 4)
      val v = Array.tabulate(16)(i =>
        (c(i) + ((id * 31 + i * 7) % 10) / 20.0).toFloat)
      (id.toLong, v)
    }.toDF("vec_id", "vec")
  }

  private lazy val books =
    ProductQuantization.train(corpus, "vec", "vec_id", Sub, SubDim, K,
      steps = 2)

  test("training is deterministic and independent of partitioning") {
    val again = ProductQuantization.train(corpus.repartition(7), "vec",
      "vec_id", Sub, SubDim, K, steps = 2)
    def flat(b: ProductQuantization.Codebooks) =
      b.map(_.map(_.toSeq).toSeq).toSeq
    assert(flat(books) === flat(again))
  }

  test("duplicate vectors among the leading rows do not dead-lock " +
      "identical seed centroids — seeding takes the first K DISTINCT") {
    // rows 0..9 all carry the SAME vector; distinct vectors follow.
    // First-K-ROWS seeding would make all K=8 seeds identical: the
    // lowest-code tiebreak then starves 7 centroids forever and the
    // effective codebook is 1.
    val dup = (0 until 100).map { id =>
      val v =
        if (id < 10) Array.fill(16)(1.0f)
        else Array.tabulate(16)(i =>
          ((id * 31 + i * 7) % 40).toFloat / 4.0f)
      (id.toLong, v)
    }.toDF("vec_id", "vec")
    val b = ProductQuantization.train(dup, "vec", "vec_id", Sub,
      SubDim, K, steps = 1)
    for (j <- 0 until Sub)
      assert(b(j).map(_.toSeq).distinct.length === K,
        s"subspace $j has duplicate (dead) centroids")
    // and too few distinct vectors fails loudly, not silently
    val allSame = (0 until 50)
      .map(id => (id.toLong, Array.fill(16)(2.0f)))
      .toDF("vec_id", "vec")
    assert(intercept[IllegalArgumentException] {
      ProductQuantization.train(allSame, "vec", "vec_id", Sub,
        SubDim, K, steps = 1)
    }.getMessage.contains("DISTINCT"))
  }

  test("codes are in range and encoding is 32x smaller than float dims") {
    val enc = ProductQuantization.encode(corpus, "vec", books, SubDim, "pq")
    val codes = enc.select(col("pq")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == Sub && c.forall(x =>
      x >= 0 && x < K)))
    // 16 floats (64 bytes) -> 4 code bytes
    assert(Sub * 1 * 16 === 64)
  }

  test("reconstruction error is small relative to the data spread") {
    val enc = ProductQuantization.encode(corpus, "vec", books, SubDim, "pq")
      .withColumn("dec", ProductQuantization.decodeExpr(col("pq"), books))
    val mse = enc.select(
      expr("aggregate(zip_with(vec, dec, (a, b) -> " +
        "(cast(a as double) - b) * (cast(a as double) - b)), 0d, " +
        "(s, x) -> s + x)").as("se"))
      .agg(avg(col("se"))).head.getDouble(0) / 16.0
    // per-component squared error far below the inter-cluster gap (25)
    assert(mse < 1.0, s"mse=$mse")
  }

  test("ADC nearest neighbor recovers the query's own cluster") {
    val enc = ProductQuantization.encode(corpus, "vec", books, SubDim, "pq")
      .persist()
    val queries = corpus.filter(col("vec_id") < 8)
      .as[(Long, Array[Float])].collect()
    val hits = queries.count { case (qid, qv) =>
      val d = ProductQuantization.adcDistance(col("pq"),
        qv.map(_.toDouble), books, SubDim)
      val best = enc.filter(col("vec_id") =!= qid)
        .select(col("vec_id"), d.as("d"))
        .orderBy(col("d"), col("vec_id")).limit(1)
        .as[(Long, Double)].head()
      // nearest by ADC shares the query's cluster (id mod 4)
      best._1 % 4 == qid % 4
    }
    enc.unpersist()
    assert(hits >= 7, s"ADC cluster recall $hits/8")
  }
}
