package graft

import org.apache.spark.sql.functions._

/** Mergeable HLL cardinality sketches (Spark's DataSketches built-ins)
  * as an incremental artifact: per-batch sketches persist, corpus
  * cardinality is the union of batch sketches — appending a batch
  * never rescans old ones. These tests pin the properties a12 and the
  * artifact pattern rest on.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 10000L)
    .map(i => (i, i % 1337))
    .toDF("doc_id", "val")

  test("unioned estimate is invariant to how batches were cut") {
    // register slots hold per-slot maxima, so ANY batching of the same
    // item set yields identical union state — the property that makes
    // per-batch sketch artifacts composable (a 2-batch history and a
    // re-batched 8-batch history must agree exactly)
    def est(ways: Int): Double = docs
      .groupBy((col("doc_id") % ways).as("b"))
      .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .as[Double].head()
    val e2 = est(2)
    assert(est(4) === e2)
    assert(est(8) === e2)
    // and the estimate is an estimate OF the right thing
    assert(math.abs(e2 - 1337.0) <= 1337.0 * 0.05, s"e2=$e2")
  }

  test("sketch artifacts round-trip through parquet and union " +
      "incrementally") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hll").toString
    try {
      // batch 1 persisted as a sketch artifact
      docs.filter(col("doc_id") < 6000)
        .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
        .withColumn("batch", lit(1L))
        .write.mode("overwrite").parquet(s"$dir/sk")
      // batch 2 appended WITHOUT touching batch 1's rows
      docs.filter(col("doc_id") >= 6000)
        .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
        .withColumn("batch", lit(2L))
        .write.mode("append").parquet(s"$dir/sk")
      val merged = spark.read.parquet(s"$dir/sk")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
        .as[Double].head()
      // must equal the same union computed without the parquet hop
      val direct = docs
        .groupBy((col("doc_id") < 6000).as("b"))
        .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
        .as[Double].head()
      assert(merged === direct)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("appending a batch never decreases the estimate") {
    val sk1 = docs.filter(col("doc_id") < 5000)
      .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
    val est1 = sk1
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .as[Double].head()
    val est12 = docs
      .groupBy((col("doc_id") < 5000).as("b"))
      .agg(expr("hll_sketch_agg(val, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .as[Double].head()
    assert(est12 >= est1)
  }
}
