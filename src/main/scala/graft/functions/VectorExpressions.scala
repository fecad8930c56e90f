package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `vec_dot(a, b)` — native codegen'd dot product of two
  * `array<float>` columns, accumulating in double in index order.
  *
  * Why a custom Catalyst Expression (the one hot path that earns it):
  * the composable alternative `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc,v) -> acc+v)` allocates an intermediate array per row and
  * evaluates interpreted lambda closures per element — higher-order
  * functions don't compile into whole-stage codegen. For ANN scoring
  * the dot product runs once per candidate PAIR (the innermost loop of
  * the whole workload at 100 TB), so it compiles to a tight primitive
  * loop here instead. Semantics match the fold exactly: double
  * accumulation in index order; NULL on a null element OR a length
  * mismatch (zip_with null-pads the shorter array, so the fold is
  * NULL there too).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Nullable even when both children are non-null arrays: a NULL
  // ELEMENT yields a NULL result, and codegen must keep ev.isNull
  // assignable (non-nullable children would fold it to a literal).
  override def nullable: Boolean = true

  // A NULL element anywhere in the fold makes the whole result NULL —
  // exactly what the zip_with/aggregate fold does (x*NULL = NULL,
  // acc+NULL = NULL) — and so does a LENGTH MISMATCH: zip_with
  // null-pads the shorter array, so the fold is NULL for every
  // unequal-length pair. The old min(len) prefix dot silently scored
  // a truncated/corrupt embedding with a plausible partial similarity
  // instead of NULL. The isNullAt bit-check is branch-predictable
  // noise for the all-non-null fast path (UnsafeArrayData primitive
  // layout).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** `pq_assign(vec, codebook, offset, subdim)` — nearest-centroid id
  * (argmin squared L2, lowest id on ties) of the sub-vector
  * `vec[offset+1 .. offset+subdim]` against a FOLDABLE flattened
  * codebook (`array<double>` of k·subdim, centroid-major).
  *
  * Why a custom Expression (the second hot path that earns it, after
  * [[FloatVecDot]]): the composed form — an `array_min` over k structs
  * each holding an unrolled subdim-term distance chain — generates
  * O(k·subdim) Java per USE, and product-quantization encode has
  * `subspaces` uses in one projection: at 8×16×8 the single generated
  * method crossed janino's hard 64 KB limit and Spark disabled
  * whole-stage codegen for the entire encode projection (interpreted
  * eval on the innermost per-row loop of the PQ path). A HOF rewrite
  * stays interpreted by construction. This expression generates a
  * constant-size nested loop over a referenced codebook array, so
  * encode codegen is O(subspaces) lines regardless of k and subdim and
  * the projection stays inside whole-stage codegen at any codebook
  * size. Semantics match the unrolled chain: per-component double
  * arithmetic in index order, strict `<` keeps the lowest centroid id
  * on exact ties, NULL vector or NULL element (or a vector too short
  * for the slice) → NULL.
  */
case class PqAssign(child: Expression, book: Seq[Double], off: Int,
    sub: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(sub >= 1 && book.nonEmpty && book.length % sub == 0,
    "pq_assign: subdim >= 1 and |codebook| a non-zero multiple of subdim" +
      s" (got |book|=${book.length}, sub=$sub)")
  // a negative offset would pass the numElements bound (5 < -1+2 is
  // false) and drive getFloat(-1) into unchecked Platform reads —
  // garbage floats or a JVM crash instead of a plan-build failure
  require(off >= 0, s"pq_assign: offset >= 0 (got $off)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_assign expects an array<float> vector, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_assign"
  // NULL on null vector, null element, or a vector too short to slice
  override def nullable: Boolean = true

  private lazy val bookArr: Array[Double] = book.toArray
  private lazy val kV: Int = bookArr.length / sub

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < off + sub) return null
    var i = 0
    while (i < sub) {
      if (a.isNullAt(off + i)) return null
      i += 1
    }
    // copy the sub-vector to a primitive buffer once: the centroid
    // loop then runs k*subDim pure-arithmetic iterations instead of
    // k*subDim virtual ArrayData.getFloat calls
    val buf = new Array[Double](sub)
    i = 0
    while (i < sub) { buf(i) = a.getFloat(off + i).toDouble; i += 1 }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < kV) {
      var s = 0.0
      i = 0
      while (i < sub) {
        val d = buf(i) - bookArr(c * sub + i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bk = ctx.addReferenceObj("pqBook", bookArr, "double[]")
      val (s, d, c, i, best, bestD) = (ctx.freshName("s"),
        ctx.freshName("d"), ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("best"), ctx.freshName("bestD"))
      // scratch buffer as MUTABLE STATE (one per generated class),
      // refilled per row: a per-row `new double[sub]` in the tightest
      // loop of the encode path was pure young-gen churn for a
      // compile-time-constant size
      val buf = ctx.addMutableState("double[]", "pqAssignBuf",
        v => s"$v = new double[$sub];")
      s"""
         |if ($a.numElements() < ${off + sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $sub; $i++) {
         |    if ($a.isNullAt($off + $i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $sub; $i++) {
         |    $buf[$i] = (double) $a.getFloat($off + $i);
         |  }
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $kV; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $d = $buf[$i] - $bk[$c * $sub + $i];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqAssign = copy(child = newChild)
}

/** `pq_adc(code, qvec, codebook, subdim)` — product-quantization
  * asymmetric distance (ADC): the squared L2 distance from a QUERY
  * vector (`array<float>`, travels with the broadcast query table) to
  * a candidate row's PQ code (`array<int>`, one id per subspace)
  * against a FOLDABLE flattened codebook (`array<double>`, laid out
  * subspace-major: `book[((j*k)+c)*subdim + i]`).
  *
  * Why a custom Expression: this is the ANN serving hot path — one
  * evaluation per (query, candidate) pair. The previous shape
  * precomputed per-query lookup tables as literal arrays, which forced
  * ONE PLAN BRANCH PER QUERY VECTOR (a driver-side union loop): plan
  * size and analysis time grew linearly with the query batch and the
  * encoded frame was re-scanned per query. With the query vector as an
  * ordinary column, all queries share one broadcast-join plan and the
  * distance computation stays inside whole-stage codegen (constant-size
  * generated loop over a referenced codebook, same janino-safe design
  * as [[PqAssign]]).
  *
  * Semantics replicate the lookup-table form bit-for-bit: per subspace
  * j (ascending) the partial is a left-fold over components of
  * `(q_i - c_i)^2` in double, and the subspace partials accumulate in
  * ascending-j order — identical fp op order to
  * `tables.map(element_at).reduce(_ + _)`. NULL code/vector, NULL
  * element, a vector too short for `subspaces*subdim`, a code whose
  * length is not exactly `|codebook| / (k*subdim)` subspaces, or a
  * code id outside `[0, k)` → NULL. `k` is EXPLICIT (the caller
  * always knows it): inferring it from the code length let a
  * truncated code whose `m*sub` still divided `|codebook|` read
  * wrong-but-in-bounds slices and return a plausible finite distance.
  */
case class PqAdc(left: Expression, right: Expression, book: Seq[Double],
    sub: Int, k: Int) extends BinaryExpression {
  require(sub >= 1 && k >= 1 && book.nonEmpty &&
    book.length % (sub * k) == 0,
    "pq_adc: subdim/k >= 1 and |codebook| a non-zero multiple of " +
      s"k*subdim (got |book|=${book.length}, sub=$sub, k=$k)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int> code, array<float> query), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  private lazy val bookArr: Array[Double] = book.toArray

  override protected def nullSafeEval(c: Any, q: Any): Any = {
    val code = c.asInstanceOf[ArrayData]
    val qv = q.asInstanceOf[ArrayData]
    val m = code.numElements()
    if (m == 0 || m * sub * k != bookArr.length ||
      qv.numElements() < m * sub) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val cj = code.getInt(j)
      if (cj < 0 || cj >= k) return null
      var t = 0.0
      var i = 0
      while (i < sub) {
        if (qv.isNullAt(j * sub + i)) return null
        val d = qv.getFloat(j * sub + i).toDouble -
          bookArr((j * k + cj) * sub + i)
        t += d * d
        i += 1
      }
      total += t
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val bk = ctx.addReferenceObj("adcBook", bookArr, "double[]")
      val (m, j, i, cj, t, total, d) = (ctx.freshName("m"),
        ctx.freshName("j"), ctx.freshName("i"),
        ctx.freshName("cj"), ctx.freshName("t"), ctx.freshName("total"),
        ctx.freshName("d"))
      s"""
         |int $m = $c.numElements();
         |if ($m == 0 || $m * $sub * $k != $bk.length ||
         |    $q.numElements() < $m * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $cj = $c.getInt($j);
         |    if ($cj < 0 || $cj >= $k) { ${ev.isNull} = true; break; }
         |    double $t = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      if ($q.isNullAt($j * $sub + $i)) { ${ev.isNull} = true; break; }
         |      double $d = (double) $q.getFloat($j * $sub + $i)
         |        - $bk[($j * $k + $cj) * $sub + $i];
         |      $t += $d * $d;
         |    }
         |    $total += $t;
         |  }
         |  ${ev.value} = $total;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** `pq_tables(qvec, codebook, subdim, k)` — the per-QUERY half of
  * asymmetric distance: the `subspaces × k` lookup table of squared
  * distances from the query's sub-vectors to every codebook centroid,
  * laid out `t[(j*k)+c]`. Evaluated ONCE per query row (in the
  * broadcast query frame, before the exchange), it restores classic
  * ADC asymmetry: [[PqAdc]] recomputes the full `dim`-component
  * distance per (candidate, query) PAIR — `dim` multiply-adds — while
  * table + [[PqAdcLookup]] makes each pair `subspaces` array loads.
  * Entry values use the identical per-subspace left fold, so
  * table+lookup is bit-equal to [[PqAdc]] (spec-asserted).
  */
case class PqAdcTables(child: Expression, book: Seq[Double], sub: Int,
    k: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(sub >= 1 && k >= 1 && book.nonEmpty &&
    book.length % (k * sub) == 0,
    "pq_tables: |codebook| must be subspaces*k*subdim" +
      s" (got |book|=${book.length}, sub=$sub, k=$k)")

  private lazy val bookArr: Array[Double] = book.toArray
  private lazy val m: Int = bookArr.length / (k * sub)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_tables expects an array<float> query vector, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_tables"
  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    if (qv.numElements() < m * sub) return null
    var p = 0
    while (p < m * sub) {
      if (qv.isNullAt(p)) return null
      p += 1
    }
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var t = 0.0
        var i = 0
        while (i < sub) {
          val d = qv.getFloat(j * sub + i).toDouble -
            bookArr((j * k + c) * sub + i)
          t += d * d
          i += 1
        }
        out(j * k + c) = t
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val bk = ctx.addReferenceObj("pqtBook", bookArr, "double[]")
      val (out, j, c, i, t, d, p) = (ctx.freshName("out"),
        ctx.freshName("j"), ctx.freshName("c"), ctx.freshName("i"),
        ctx.freshName("t"), ctx.freshName("d"), ctx.freshName("p"))
      s"""
         |if ($q.numElements() < ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $p = 0; $p < ${m * sub}; $p++) {
         |    if ($q.isNullAt($p)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double[] $out = new double[${m * k}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $t = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $d = (double) $q.getFloat($j * $sub + $i)
         |          - $bk[($j * $k + $c) * $sub + $i];
         |        $t += $d * $d;
         |      }
         |      $out[$j * $k + $c] = $t;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqAdcTables = copy(child = newChild)
}

/** `pq_adc_lookup(code, tables, k)` — the per-PAIR half of asymmetric
  * distance: `subspaces` loads from the query's precomputed
  * [[PqAdcTables]] column, summed in ascending-subspace order (the
  * same fold as [[PqAdc]]'s subspace partials — bit-equal results).
  * NULL code/tables, a NULL table element, a code id outside
  * `[0, k)`, or a table whose length is not exactly `m*k` → NULL.
  * `k` is EXPLICIT for the same reason as [[PqAdc]]'s: inferring it
  * from the shapes let a truncated code that still divided the table
  * length read wrong-but-in-bounds entries.
  */
case class PqAdcLookup(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"pq_adc_lookup: k >= 1 (got $k)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_lookup expects (array<int> code, array<double> tables)," +
          s" got ${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_lookup"
  override def nullable: Boolean = true

  override protected def nullSafeEval(c: Any, t: Any): Any = {
    val code = c.asInstanceOf[ArrayData]
    val tab = t.asInstanceOf[ArrayData]
    val m = code.numElements()
    if (m == 0 || tab.numElements() != m * k) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val cj = code.getInt(j)
      if (cj < 0 || cj >= k) return null
      if (tab.isNullAt(j * k + cj)) return null
      total += tab.getDouble(j * k + cj)
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val (m, j, cj, total) = (ctx.freshName("m"),
        ctx.freshName("j"), ctx.freshName("cj"), ctx.freshName("total"))
      s"""
         |int $m = $c.numElements();
         |if ($m == 0 || $t.numElements() != $m * $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $total = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $cj = $c.getInt($j);
         |    if ($cj < 0 || $cj >= $k) { ${ev.isNull} = true; break; }
         |    if ($t.isNullAt($j * $k + $cj)) { ${ev.isNull} = true; break; }
         |    $total += $t.getDouble($j * $k + $cj);
         |  }
         |  ${ev.value} = $total;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcLookup =
    copy(left = newLeft, right = newRight)
}

/** `ivf_assign(vec, norm, cents, mns, cells, dim)` — nearest-centroid
  * CELL ID by rounded cosine similarity: for each centroid c,
  * `sim_c = round(dot(vec, cents_c) / (norm · mns_c), 6)`; returns the
  * cell id of the max sim, lowest cell id on ties. cents (flattened
  * centroid-major doubles), mns (centroid L2 norms), cells (cell ids,
  * REQUIRED ascending — that is what makes strict `>` the lowest-id
  * tiebreak) and dim are foldable and become reference objects.
  *
  * This is the assignment step of the trained-IVF query (s4)
  * collapsed into one constant-size loop. The composed form — a
  * broadcast cross join against the centroid frame, a 64-term dot
  * chain per (vector, centroid), and a max_by aggregation, three
  * times (seed round + 2 Lloyd rounds) — was ~95% plan-build and
  * codegen constant (identical wall time at sf0.001 and sf0.1).
  * Arithmetic is REPLICATED bit-for-bit so the DuckDB oracle still
  * matches: the dot accumulates left-to-right in double exactly like
  * the generated left-deep `+` chain, and rounding is Spark's own
  * double round — `BigDecimal.valueOf(x).setScale(6, HALF_UP)` with
  * NaN/Inf passthrough (verified against spark-catalyst 4.1.2
  * RoundBase bytecode; spec'd against `round()` on adversarial
  * boundaries in VectorExprSpec).
  */
case class IvfAssign(left: Expression, right: Expression,
    books: Seq[Double], mns: Seq[Double], cells: Seq[Long], dim: Int)
    extends BinaryExpression {
  // an empty centroid set would skip the scan entirely and return the
  // uninitialized cell id 0 for every row — fail at plan build like
  // pq_assign's book.nonEmpty
  require(mns.nonEmpty, "ivf_assign: centroid set must be non-empty")
  require(cells.length == mns.length &&
    books.length == mns.length * dim &&
    cells.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "ivf_assign: |cells|==|mns|, |books|==k*dim, cells strictly ascending")
  // A zero (or negative/NaN) centroid norm would make `raw` NaN for a
  // zero dot product, and the strict `>` record-high scan orders NaN
  // differently from the composed max_by it replicates (max_by treats
  // NaN as largest). Requiring positive norms makes the divergent case
  // impossible by construction rather than silently wrong.
  // The per-ROW norm is not plan-checkable: a zero/NaN row norm makes
  // every `raw` NaN, no candidate ever beats the first, and the row
  // deterministically lands in cells(0) — the documented contract for
  // degenerate vectors (the builders exclude zero-norm rows from the
  // statistics but still assign them somewhere stable).
  require(mns.forall(m => m > 0.0 && !java.lang.Double.isNaN(m)),
    "ivf_assign: centroid norms must be strictly positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivf_assign expects (array<float>, double), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ivf_assign"
  override def nullable: Boolean = true

  private lazy val bookArr: Array[Double] = books.toArray
  private lazy val mnArr: Array[Double] = mns.toArray
  private lazy val cellArr: Array[Long] = cells.toArray
  private lazy val kV: Int = mnArr.length

  /** Spark's Round on DoubleType, exactly (RoundBase): NaN/Inf pass
    * through, else decimal HALF_UP at scale 6 via the canonical
    * string representation (BigDecimal.valueOf).
    */
  @inline private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(v: Any, n: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val nv = n.asInstanceOf[Double]
    // round6 is monotone non-decreasing, so round6(raw) can only beat
    // the incumbent when raw itself is a new record high — rounding is
    // evaluated ONLY on record highs (expected H(k) ≈ ln k times, not
    // k times). Identical selection to rounding every candidate:
    // raw <= rawBest  ⇒ round6(raw) <= rBest (never replaces), and on
    // a record high a rounded TIE keeps the earlier (lower) cell id.
    // Measured: at k=64 the per-candidate BigDecimal was ~90% of the
    // expression's runtime (ScaleProbe 2M×64-dim: 23.5 s → see NOTES).
    // primitive buffer: the centroid loop is k*dim pure mult-adds,
    // not k*dim virtual ArrayData.getFloat calls
    val buf = new Array[Double](dim)
    i = 0
    while (i < dim) { buf(i) = a.getFloat(i).toDouble; i += 1 }
    var bestCell = 0L
    var rawBest = 0.0
    var rBest = 0.0
    var first = true
    var c = 0
    while (c < kV) {
      var dot = 0.0
      i = 0
      while (i < dim) {
        dot += buf(i) * bookArr(c * dim + i)
        i += 1
      }
      val raw = dot / (nv * mnArr(c))
      if (first) {
        rawBest = raw; rBest = round6(raw); bestCell = cellArr(c)
        first = false
      } else if (raw > rawBest) {
        val r = round6(raw)
        rawBest = raw
        if (r > rBest) { rBest = r; bestCell = cellArr(c) }
      }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val bk = ctx.addReferenceObj("ivfBooks", bookArr, "double[]")
      val mn = ctx.addReferenceObj("ivfMns", mnArr, "double[]")
      val cl = ctx.addReferenceObj("ivfCells", cellArr, "long[]")
      val (i, c, dot, raw, r, bestC, rawBest, rBest, first, nullEl) =
        (ctx.freshName("i"), ctx.freshName("c"), ctx.freshName("dot"),
          ctx.freshName("raw"), ctx.freshName("r"),
          ctx.freshName("bestC"), ctx.freshName("rawBest"),
          ctx.freshName("rBest"), ctx.freshName("first"),
          ctx.freshName("nullEl"))
      // scratch buffer as mutable state, refilled per row — the
      // per-row allocation was young-gen churn in the hottest loop
      // (see PqAssign)
      val buf = ctx.addMutableState("double[]", "ivfAssignBuf",
        v => s"$v = new double[$dim];")
      // record-high-only rounding — see nullSafeEval for the
      // monotonicity argument; round6 inlined as Spark's DoubleType
      // Round (BigDecimal.valueOf HALF_UP, NaN/Inf passthrough)
      def round6(in: String, out: String): String =
        s"""double $out =
           |  (Double.isNaN($in) || Double.isInfinite($in)) ? $in :
           |  java.math.BigDecimal.valueOf($in)
           |    .setScale(6, java.math.RoundingMode.HALF_UP)
           |    .doubleValue();""".stripMargin
      s"""
         |if ($a.numElements() < $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $nullEl = false;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $nullEl = true; break; }
         |  }
         |  if ($nullEl) {
         |    ${ev.isNull} = true;
         |  } else {
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $buf[$i] = (double) $a.getFloat($i);
         |    }
         |    long $bestC = 0L;
         |    double $rawBest = 0.0;
         |    double $rBest = 0.0;
         |    boolean $first = true;
         |    for (int $c = 0; $c < $kV; $c++) {
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += $buf[$i] * $bk[$c * $dim + $i];
         |      }
         |      double $raw = $dot / ($n * $mn[$c]);
         |      if ($first) {
         |        ${round6(raw, r)}
         |        $rawBest = $raw; $rBest = $r; $bestC = $cl[$c];
         |        $first = false;
         |      } else if ($raw > $rawBest) {
         |        ${round6(raw, r)}
         |        $rawBest = $raw;
         |        if ($r > $rBest) { $rBest = $r; $bestC = $cl[$c]; }
         |      }
         |    }
         |    ${ev.value} = $bestC;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IvfAssign =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the engine's native functions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, wired in
  * [[graft.Sessions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b)")
        FloatVecDot(args(0), args(1))
      }))
    // pq_assign(vec, codebook, offset, subdim): codebook/offset/subdim
    // must be foldable — they are evaluated once at plan build and
    // embedded as the expression's reference objects, which is what
    // keeps the generated code constant-size.
    ext.injectFunction((
      new FunctionIdentifier("pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "pq_assign"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "pq_assign(vec, codebook, offset, subdim)")
        require(args(1).foldable &&
          args(1).dataType.isInstanceOf[ArrayType] &&
          args(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType,
          "pq_assign codebook must be a foldable array<double>")
        require(args(2).foldable && args(3).foldable,
          "pq_assign offset/subdim must be foldable")
        PqAssign(args(0),
          args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq,
          args(2).eval().asInstanceOf[Number].intValue(),
          args(3).eval().asInstanceOf[Number].intValue())
      }))
    // pq_adc(code, qvec, codebook, subdim, k): codebook/subdim/k
    // foldable, same reference-object convention as pq_assign — the
    // generated code stays constant-size at any codebook size.
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "pq_adc(code, qvec, codebook, subdim, k)")
        require(args(2).foldable &&
          args(2).dataType.isInstanceOf[ArrayType] &&
          args(2).dataType.asInstanceOf[ArrayType].elementType == DoubleType,
          "pq_adc codebook must be a foldable array<double>")
        require(args(3).foldable && args(4).foldable,
          "pq_adc subdim/k must be foldable")
        PqAdc(args(0), args(1),
          args(2).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq,
          args(3).eval().asInstanceOf[Number].intValue(),
          args(4).eval().asInstanceOf[Number].intValue())
      }))
    // pq_tables(qvec, codebook, subdim, k) + pq_adc_lookup(code,
    // tables): the split ADC pair — tables once per query row,
    // lookups per candidate pair.
    ext.injectFunction((
      new FunctionIdentifier("pq_tables"),
      new ExpressionInfo(classOf[PqAdcTables].getName, "pq_tables"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "pq_tables(qvec, codebook, subdim, k)")
        require(args(1).foldable &&
          args(1).dataType.isInstanceOf[ArrayType] &&
          args(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType,
          "pq_tables codebook must be a foldable array<double>")
        require(args(2).foldable && args(3).foldable,
          "pq_tables subdim/k must be foldable")
        PqAdcTables(args(0),
          args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq,
          args(2).eval().asInstanceOf[Number].intValue(),
          args(3).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc_lookup"),
      new ExpressionInfo(classOf[PqAdcLookup].getName, "pq_adc_lookup"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "pq_adc_lookup(code, tables, k)")
        require(args(2).foldable, "pq_adc_lookup k must be foldable")
        PqAdcLookup(args(0), args(1),
          args(2).eval().asInstanceOf[Number].intValue())
      }))
    // quantile_bucket(value, cuts): cuts foldable — embedded as a
    // reference array and binary-searched (see LayoutExpressions).
    ext.injectFunction((
      new FunctionIdentifier("quantile_bucket"),
      new ExpressionInfo(classOf[QuantileBucket].getName,
        "quantile_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantile_bucket(value, cuts)")
        require(args(1).foldable &&
          args(1).dataType.isInstanceOf[ArrayType] &&
          args(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType,
          "quantile_bucket cuts must be a foldable array<double>")
        QuantileBucket(args(0),
          args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq)
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngram_distinct_count"),
      new ExpressionInfo(classOf[NgramDistinctCount].getName,
        "ngram_distinct_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2 && args(1).foldable,
          "ngram_distinct_count(text, n) with foldable n")
        NgramDistinctCount(args(0),
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("redact_pii"),
      new ExpressionInfo(classOf[RedactPii].getName, "redact_pii"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "redact_pii(text)")
        RedactPii(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash(text)")
        RollingHash(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 3 && args(1).foldable && args(2).foldable,
          "shingle_hashes(toks, n, mod) with foldable n/mod")
        ShingleHashes(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].longValue())
      }))
    // ivf_assign(vec, norm, cents, mns, cells, dim) — same foldable-
    // argument convention as pq_assign.
    ext.injectFunction((
      new FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
      (args: Seq[Expression]) => {
        require(args.length == 6,
          "ivf_assign(vec, norm, cents, mns, cells, dim)")
        require(args.drop(2).forall(_.foldable),
          "ivf_assign cents/mns/cells/dim must be foldable")
        IvfAssign(args(0), args(1),
          args(2).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq,
          args(3).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq,
          args(4).eval().asInstanceOf[ArrayData].toLongArray().toSeq,
          args(5).eval().asInstanceOf[Number].intValue())
      }))
    // bloom_might_contain(key, bits, k): bits foldable array<bigint>
    // — embedded once as a reference object (never a per-row array),
    // probe stays in whole-stage codegen. See BloomExpressions.
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bloom_might_contain(key, bits, k)")
        require(args(1).foldable &&
          args(1).dataType.isInstanceOf[ArrayType] &&
          args(1).dataType.asInstanceOf[ArrayType].elementType == LongType,
          "bloom_might_contain bits must be a foldable array<bigint>")
        require(args(2).foldable, "bloom_might_contain k must be foldable")
        BloomMightContain(args(0),
          args(1).eval().asInstanceOf[ArrayData].toLongArray().toSeq,
          args(2).eval().asInstanceOf[Number].intValue())
      }))
    // Sentinel-equality → IS NULL on tagged columns (SURVEY §4.2).
    // Injected at RESOLUTION, not optimization: it is a semantic
    // normalization, and the optimizer's early LocalRelation batch
    // would otherwise eagerly evaluate in-memory filters with the
    // un-rewritten predicate before an optimizer-stage rule ran.
    ext.injectResolutionRule(_ => SentinelRewrite)
  }
}
