package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.functions.Sentinels

/** The SentinelRewrite optimizer rule: sentinel-equality predicates on
  * tagged columns become IS NULL (and push down to the parquet scan);
  * untagged columns keep plain double equality.
  */
class SentinelRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val NoData = -9999.0

  private def frame = Sentinels.toNull(
    Seq((1L, 2.5), (2L, NoData), (3L, 7.0), (4L, NoData))
      .toDF("id", "v"),
    "v", NoData)

  test("sentinel equality on a tagged column selects the NULL rows") {
    val got = frame.filter(col("v") === NoData)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === Seq(2L, 4L))
    val plan = frame.filter(col("v") === NoData)
      .queryExecution.analyzed.toString
    val filterLine = plan.linesIterator.find(_.contains("Filter")).get
    // the FILTER is rewritten to isnull (the toNull CASE WHEN below it
    // legitimately keeps its sentinel equality on the untagged input)
    assert(filterLine.contains("isnull") && !filterLine.contains("-9999"),
      plan)
  }

  test("sentinel inequality folds to IS NOT NULL") {
    val got = frame.filter(col("v") =!= NoData)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 3L))
    val plan = frame.filter(col("v") =!= NoData)
      .queryExecution.analyzed.toString
    assert(plan.contains("NOT isnull") || plan.contains("isnotnull"), plan)
  }

  test("integer-literal sentinel comparison is also rewritten") {
    // `col === -9999` (Int literal) resolves as EqualTo(v, Cast(-9999))
    // — the cast is only folded AFTER analysis, so the rule must see
    // through it or the legacy predicate silently matches nothing.
    val got = frame.filter(col("v") === -9999)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === Seq(2L, 4L))
  }

  test("a float-typed tagged column compared to a double literal rewrites") {
    // attribute side gets Cast-wrapped (float -> double promotion)
    val f = Sentinels.toNull(
      Seq((1L, 2.5f), (2L, -9999.0f)).toDF("id", "v"), "v", NoData)
    val got = f.filter(col("v") === NoData)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }

  test("toNull on an ALREADY-TAGGED column still replaces sentinels — " +
      "the rewrite rule must not eat the normalization predicate") {
    import graft.functions.Sentinels
    // a tagged column that still carries raw sentinel values: exactly
    // what a re-read of a tagged pipeline's parquet output looks like
    // (Spark persists StructField metadata), or toNull applied twice.
    // The regression: the rule rewrote toNull's own `col === sentinel`
    // into IS NULL during analysis, so normalization no-opped while
    // the tag kept asserting "normalized".
    val tagged = Sentinels.tag(
      Seq(1.0, -9999.0, 3.0).toDF("v"), "v", -9999.0)
    val normalized = Sentinels.toNull(tagged, "v", -9999.0)
    assert(normalized.filter(col("v").isNull).count() === 1L)
    assert(normalized.filter(col("v") === -9999.0).count() === 1L,
      "the tagged-equality rewrite itself must keep working")
    // and twice-normalized is a harmless no-op on the data
    val twice = Sentinels.toNull(normalized, "v", -9999.0)
    assert(twice.filter(col("v").isNull).count() === 1L)
  }

  test("untagged columns keep plain double equality") {
    val df = Seq((1L, 2.5), (2L, NoData)).toDF("id", "v")
    assert(df.filter(col("v") === NoData).count() === 1)
    assert(df.filter(col("v") === 12345.0).count() === 0)
  }

  test("a non-sentinel literal on a tagged column is not rewritten") {
    assert(frame.filter(col("v") === 7.0)
      .select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("rewritten predicate pushes to the parquet scan as a null filter") {
    val dir = Files.createTempDirectory("graft-sentinel").toString + "/t"
    frame.write.parquet(dir)
    // field metadata round-trips through parquet, so the tag survives
    val back = spark.read.parquet(dir).filter(col("v") === NoData)
    assert(back.select("id").as[Long].collect().toSeq.sorted === Seq(2L, 4L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNull(v)]"), plan)
  }
}
