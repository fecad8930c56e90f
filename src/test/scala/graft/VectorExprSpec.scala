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
    // LENGTH MISMATCH is NULL, matching the zip_with/aggregate fold
    // (which null-pads the shorter array): a truncated embedding must
    // never score a plausible partial similarity
    val short = Seq((Seq(2.0f, 9.9f), Seq(3.0f))).toDF("a", "b")
      .select(expr("vec_dot(a, b)")).collect()
    assert(short.head.isNullAt(0))
    val foldForm = Seq((Seq(2.0f, 9.9f), Seq(3.0f))).toDF("a", "b")
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), " +
          "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")).collect()
    assert(foldForm.head.isNullAt(0)) // the fold agrees
  }

  test("pq_assign / ivf_assign refuse degenerate plan-build inputs " +
      "(negative offset, empty centroid set)") {
    assert(intercept[IllegalArgumentException] {
      graft.functions.PqAssign(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        Seq(1.0, 2.0), off = -1, sub = 2)
    }.getMessage.contains("offset"))
    assert(intercept[IllegalArgumentException] {
      graft.functions.IvfAssign(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.catalyst.expressions.Literal(1.0),
        Seq.empty, Seq.empty, Seq.empty, dim = 4)
    }.getMessage.contains("non-empty"))
  }

  test("quantile_bucket equals the HOF count of cuts <= v; edges hold") {
    val cuts = Seq(10.0, 20.0, 20.0, 30.0) // duplicate cut: v=20 -> 3
    val lits = cuts.map(d => s"${d}D").mkString(",")
    val df = Seq(5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 99.0,
      Double.NaN).toDF("v")
    val cmp = df.select(col("v"),
      expr(s"quantile_bucket(v, array($lits))").as("native"),
      expr(s"size(filter(array($lits), c -> c <= v))").as("hof"))
    // NaN is GREATER than every double under Spark comparison
    // semantics (Java's `<=` would say false) — the native search
    // special-cases it into the last bucket, agreeing with the HOF
    // on EVERY input
    assert(cmp.filter(col("native") =!= col("hof")).count() === 0)
    val edge = df.select(expr(s"quantile_bucket(v, array($lits))"))
      .as[Int].collect().toSeq
    assert(edge === Seq(0, 1, 1, 3, 3, 4, 4, 4))
    // null in, null out
    assert(Seq(Option.empty[Double]).toDF("v")
      .select(expr(s"quantile_bucket(v, array($lits))"))
      .as[Option[Int]].head() === None)
  }

  test("pq_assign matches the composed argmin and handles nulls") {
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(4)(Array.fill(3)(rnd.nextDouble() * 2 - 1))
    val df = Seq.fill(60)(Seq.fill(8)(rnd.nextFloat() * 2 - 1))
      .toDF("v")
    // composed reference: array_min over (distSq, idx) structs at
    // offset 2 — the exact semantics pq_assign replaces
    val composed = array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(c.zipWithIndex.map { case (cc, j) =>
        val d = element_at(col("v"), 2 + j + 1).cast("double") - lit(cc)
        d * d
      }.reduce(_ + _).as("d"), lit(i).as("i"))
    }: _*)).getField("i")
    val native = call_function("pq_assign", col("v"),
      typedLit(cents.flatten.toSeq), lit(2), lit(3))
    assert(df.select(native.as("n"), composed.as("c"))
      .filter(col("n") =!= col("c")).count() === 0)
    // null vector and too-short vector are NULL, never an exception
    val edge = Seq((null: Seq[Float], Seq(1.0f))).toDF("a", "b")
      .select(
        call_function("pq_assign", col("a"),
          typedLit(Seq(0.0, 0.0)), lit(0), lit(2)),
        call_function("pq_assign", col("b"),
          typedLit(Seq(0.0, 0.0)), lit(0), lit(2)))
      .collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("pq_assign keeps a full PQ encode inside whole-stage codegen") {
    // the composed argmin form at production shape (8 subspaces x 16
    // centroids x 8 dims) blew janino's 64 KB method limit and
    // disabled codegen for the whole encode projection; the native
    // loop must keep it compiled — fallback disabled makes a broken
    // doGenCode throw instead of silently interpreting
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(3)
      val books = Array.fill(8)(Array.fill(16)(
        Array.fill(8)(rnd.nextDouble() * 0.4 - 0.2)))
      val df = graft.operators.ProductQuantization.encode(
        Tables.embeddings(spark, "/root/testdata/sf0.001"),
        "embedding", books, 8, "code")
        .select("code")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), plan)
      val codes = df.as[Seq[Int]].collect()
      assert(codes.length === 500)
      assert(codes.forall(cs => cs.length === 8 &&
        cs.forall(c => c >= 0 && c < 16)))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("pq_adc matches the literal-lookup-table ADC bit-for-bit") {
    // the per-query literal form (adcDistance: element_at over
    // precomputed (q-c)^2 tables, subspace partials reduced left) is
    // the reference semantics pq_adc replicates with the query as a
    // COLUMN; fp op order is identical, so the comparison is exact
    val rnd = new scala.util.Random(23)
    val books = Array.fill(4)(Array.fill(8)(
      Array.fill(4)(rnd.nextDouble() * 2 - 1)))
    val query = Array.fill(16)(rnd.nextDouble() * 2 - 1)
    val qf = query.map(_.toFloat)
    // re-derive the double query from the float column exactly as the
    // expression sees it (float -> double is exact)
    val qd = qf.map(_.toDouble)
    val enc = graft.operators.ProductQuantization.encode(
      Seq.fill(60)(Seq.fill(16)(rnd.nextFloat() * 2 - 1)).toDF("v"),
      "v", books, 4, "code")
      .withColumn("qv", typedLit(qf.toSeq))
    val cmp = enc.select(
      graft.operators.ProductQuantization
        .adcDistCol(col("code"), col("qv"), books, 4).as("native"),
      graft.operators.ProductQuantization
        .adcDistance(col("code"), qd, books, 4).as("literal"),
      // the split serving form: per-query tables + per-pair lookups
      graft.operators.ProductQuantization.adcLookupCol(col("code"),
        graft.operators.ProductQuantization
          .adcTablesCol(col("qv"), books, 4),
        books.head.length).as("split"))
    assert(cmp.filter(col("native") =!= col("literal")).count() === 0)
    // all three forms share the exact per-subspace folds and summing
    // order — bit-equal, which is what lets the serving queries use
    // the cheap split form under the same oracle
    assert(cmp.filter(col("split") =!= col("native")).count() === 0)
  }

  test("pq_adc null/edge semantics: null inputs, short vector, bad code") {
    val book = typedLit(Seq(0.0, 0.0, 1.0, 1.0)) // 1 subspace shapes
    val rows = Seq((Seq(0), Seq(0.5f, 0.5f))).toDF("code", "qv")
    // out-of-range code id and too-short query vector are NULL
    val edge = rows.select(
      call_function("pq_adc", typedLit(Seq(7)), col("qv"), book, lit(2),
        lit(2)),
      call_function("pq_adc", col("code"), typedLit(Seq(0.5f)), book,
        lit(2), lit(2)),
      call_function("pq_adc", lit(null).cast("array<int>"), col("qv"),
        book, lit(2), lit(2)),
      // a TRUNCATED code whose m*sub still divides |codebook| must be
      // NULL, not a plausible distance over mis-sliced centroids —
      // here |book|=4, sub=1, k=2 expects m=2 but the code has m=1
      // (1*1 divides 4, the old k-inference accepted it)
      call_function("pq_adc", typedLit(Seq(0)), col("qv"), book, lit(1),
        lit(2))).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2) &&
      edge.isNullAt(3))
    // happy path: code 1 selects centroid (1,1): (0.5-1)^2 * 2 = 0.5
    val ok = rows.select(call_function("pq_adc", typedLit(Seq(1)),
      col("qv"), book, lit(2), lit(2))).as[Double].head()
    assert(ok === 0.5)
  }

  test("pq_adc keeps the serving join inside whole-stage codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(5)
      val books = Array.fill(8)(Array.fill(16)(
        Array.fill(8)(rnd.nextDouble() * 0.4 - 0.2)))
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      val enc = graft.operators.ProductQuantization.encode(
        e, "embedding", books, 8, "code")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val scored = broadcast(q)
        .join(enc.select("vec_id", "code"), col("q_id") =!= col("vec_id"))
        .select(graft.operators.ProductQuantization
          .adcDistCol(col("code"), col("qv"), books, 8).as("d"))
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("pq_adc"), plan)
      val ds = scored.as[Double].collect()
      assert(ds.length === 3 * 499 && ds.forall(_ >= 0.0))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("TopKMin equals the row_number window top-k on any partitioning") {
    // random groups/values incl. duplicate values (id tiebreak) — the
    // aggregator's selection and rank-by-position must equal
    // row_number() OVER (ORDER BY v ASC, id ASC) <= k exactly,
    // independent of partitioning (map-side partial merge)
    val rnd = new scala.util.Random(29)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, (rnd.nextInt(50) / 10.0), i.toLong)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val f = graft.functions.TopKMin(3)
      val agg = df.groupBy(col("g"))
        .agg(f(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col._2").as("id"),
          col("col._1").as("v"), (col("pos") + 1).as("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq.sorted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
      val win = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("g"), col("id"), col("v"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq.sorted
      assert(agg === win, s"parts=$parts")
    }
    // groups smaller than k emit only their real rows (no sentinels)
    val tiny = Seq((1L, 0.5, 10L)).toDF("g", "v", "id")
    val f1 = graft.functions.TopKMin(3)
    val out = tiny.groupBy(col("g"))
      .agg(f1(col("v"), col("id")).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(out === 1)
    // the finiteness contract is ENFORCED, not conventional: a NaN
    // score (e.g. a zero-norm embedding's cosine) must fail loudly —
    // the window form it replaces would rank NaN first, so a silent
    // drop would be an invisible divergence
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity)) {
      val ex = intercept[Exception] {
        Seq((1L, bad, 1L), (1L, 2.0, 2L)).toDF("g", "v", "id")
          .groupBy(col("g"))
          .agg(f1(col("v"), col("id")).as("top"))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
      assert(msgs(ex).exists(m => m != null && m.contains("finite")), ex)
    }
  }

  test("ivf_assign matches the composed cross-join + max_by assignment") {
    // the composed reference this expression replaced: broadcast
    // centroid frame, per-pair rounded cosine, max_by(struct(csim,
    // -cell)) — including Spark's own round(), so any divergence in
    // the replicated HALF_UP rounding or tiebreak fails here
    val e = operators.SimilarityOps.withNorm(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), "embedding", "n")
    val cents = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"), col("n"))
      .collect().sortBy(_.getLong(0))
    val cells = cents.map(_.getLong(0) * 3 + 1) // non-contiguous ids
    val books = cents.flatMap(_.getSeq[Float](1).map(_.toDouble))
    val mns = cents.map(_.getDouble(2))
    val centFrame = cents.zipWithIndex.map { case (r, i) =>
      (cells(i), r.getSeq[Float](1), mns(i))
    }.toSeq.toDF("cell", "cvec", "cn")
    val dim = cents.head.getSeq[Float](1).length
    val composed = e.join(broadcast(centFrame))
      .select(col("vec_id"),
        round(expr("vec_dot(embedding, cvec)") / (col("n") * col("cn")), 6)
          .as("csim"), col("cell"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("csim"), -col("cell")))
        .as("cell_ref"))
    val native = e.select(col("vec_id"),
      call_function("ivf_assign", col("embedding"), col("n"),
        typedLit(books.toSeq), typedLit(mns.toSeq), typedLit(cells.toSeq),
        lit(dim)).as("cell_got"))
    val joined = native.join(composed, Seq("vec_id"))
    assert(joined.count() === 500)
    assert(joined.filter(col("cell_got") =!= col("cell_ref")).count() === 0)
  }

  test("ivf_assign resolves rounded ties to the lowest cell id") {
    // two identical centroids under different cell ids: every sim is
    // an exact tie after rounding, so the LOWER id must always win
    val df = Seq(Seq(0.5f, -0.25f, 0.125f)).toDF("v")
      .withColumn("n", expr("sqrt(vec_dot(v, v))"))
    val book = Seq(0.2, 0.4, -0.1)
    val got = df.select(call_function("ivf_assign", col("v"), col("n"),
      typedLit(book ++ book), typedLit(Seq(1.0, 1.0)),
      typedLit(Seq(4L, 9L)), lit(3))).as[Long].head()
    assert(got === 4L)
  }

  test("ngram_distinct_count equals the composed distinct-gram size") {
    // real corpus + adversarial unicode: multibyte chars (character
    // semantics, not bytes), a supplementary (non-BMP) char, short and
    // empty strings
    val edge = Seq("", "ab", "abc", "aaaa", "héllo wörld",
      "a😀b😀a", "ééé").toDF("text")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text")
    for (df <- Seq(edge, corpus); n <- Seq(3, 4)) {
      val cmp = df.select(
        operators.TextOps.distinctNgramCount("text", n).as("native"),
        size(operators.TextOps.charNgrams("text", n)).cast("long")
          .as("composed"))
      assert(cmp.filter(col("native") =!= col("composed")).count() === 0,
        s"n=$n")
    }
    val nulls = Seq((null: String)).toDF("text")
      .select(operators.TextOps.distinctNgramCount("text", 3)).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("rolling_hash equals the composed per-char aggregate fold") {
    val fold = expr(
      """aggregate(
           transform(sequence(1, greatest(length(text), 1)),
                     i -> ascii(substring(text, i, 1))),
           0L, (h, c) -> pmod(h * 31 + c, 1000000007L))""")
    val edge = Seq("", "a", "ab", "héllo", "a😀b").toDF("text")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text")
    for (df <- Seq(edge, corpus)) {
      val cmp = df.select(
        operators.TextOps.rollingHash("text").as("native"),
        fold.as("composed"))
      assert(cmp.filter(col("native") =!= col("composed")).count() === 0)
    }
  }

  test("shingle_hashes equals the composed hash15-per-shingle transform") {
    // bit-packed JVM hash15 == hex-parsing JVM hash15 == SQL form
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val bytes = Array.fill(rnd.nextInt(40))(rnd.nextInt().toByte)
      assert(graft.functions.ShingleOps.hash15(bytes) ===
        operators.MultimodalOps.hash15Jvm(bytes))
    }
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", operators.TextOps.tokens(col("text")))
    val edge = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("héllo", "wörld", "😀"), Seq[String]())
      .toDF("toks")
    for (df <- Seq(corpus, edge);
         (n, mod) <- Seq((3, operators.DedupOps.MinHashP), (3, 0L), (1, 0L))) {
      val modSql = if (mod > 0) s" % $mod" else ""
      val composed = expr(
        s"""transform(
              slice(transform(sequence(1, greatest(size(toks) - ${n - 1}, 1)),
                i -> concat_ws(' ', ${(0 until n)
                  .map(k => s"try_element_at(toks, i + $k)").mkString(", ")})),
                1, greatest(size(toks) - ${n - 1}, 0)),
              sh -> cast(conv(substring(md5(sh), 1, 15), 16, 10)
                AS BIGINT)$modSql)""")
      val cmp = df.select(
        expr(s"shingle_hashes(toks, $n, $mod)").as("native"),
        composed.as("composed"))
      assert(cmp.filter(col("native") =!= col("composed")).count() === 0,
        s"n=$n mod=$mod")
    }
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
