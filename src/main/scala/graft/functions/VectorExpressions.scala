package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
  * accumulation in index order over min(len) elements.
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

  // A NULL element anywhere in the folded prefix makes the whole result
  // NULL — exactly what the zip_with/aggregate fold does (x*NULL = NULL,
  // acc+NULL = NULL). The isNullAt bit-check is branch-predictable noise
  // for the all-non-null fast path (UnsafeArrayData primitive layout).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot =
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
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    // Sentinel-equality → IS NULL on tagged columns (SURVEY §4.2).
    // Injected at RESOLUTION, not optimization: it is a semantic
    // normalization, and the optimizer's early LocalRelation batch
    // would otherwise eagerly evaluate in-memory filters with the
    // un-rewritten predicate before an optimizer-stage rule ran.
    ext.injectResolutionRule(_ => SentinelRewrite)
  }
}
