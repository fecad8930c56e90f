package graft

import org.apache.spark.sql.functions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot equals the HOF fold exactly on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      expr("vec_dot(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b,
               (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("fold"))
    // bit-identical, not approximately equal: same op order in double
    assert(cmp.filter(col("native") =!= col("fold")).count() === 0)
  }

  test("vec_dot basics: orthogonal, parallel, null, length mismatch") {
    val out = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))
    ).toDF("a", "b")
      .select(expr("vec_dot(a, b)")).as[Double].collect().toSeq
    assert(out === Seq(0.0, 5.0))
    val withNull = Seq(("x")).toDF("s")
      .select(expr("vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))"))
      .collect()
    assert(withNull.head.isNullAt(0))
    val short = Seq((Seq(2.0f, 9.9f), Seq(3.0f))).toDF("a", "b")
      .select(expr("vec_dot(a, b)")).as[Double].head()
    assert(short === 6.0) // min-length semantics
  }

  test("vec_dot compiles into whole-stage codegen on a real scan") {
    // literal frames constant-fold into LocalTableScan, so drive the
    // expression from parquet; with fallback disabled a broken
    // doGenCode would throw instead of silently interpreting.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select(expr("vec_dot(embedding, embedding)").as("d"))
      val plan = df.queryExecution.executedPlan.toString
      // '*(n)' marks operators inside WholeStageCodegen stage n
      assert(plan.contains("*(1) Project [vec_dot"), plan)
      val norms = df.as[Double].collect()
      assert(norms.length === 500 && norms.forall(_ > 0.0))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }
}
