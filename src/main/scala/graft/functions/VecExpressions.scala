package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the quantized-vector dot product.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * allocates an intermediate array per row and evaluates interpreted
  * (higher-order functions are CodegenFallback), which dominates the
  * runtime of the pairwise-similarity joins. This expression emits a
  * tight primitive loop inside whole-stage codegen instead; the
  * interpreted path (nullSafeEval) computes the identical left-to-
  * right int64 sum, so results are bit-equal either way.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_array_dot expects two array<bigint>, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric-distance (ADC) lookup sum for product quantization:
  * given a vector's PQ codes (array<bigint>, one code per subspace)
  * and a query's flattened distance lookup table (array<bigint>,
  * laid out [subspace][code] with `k` codes per subspace), returns
  * sum over subspaces m of lut[m*k + codes[m]] — the classic PQ
  * search inner loop. A native expression for the same reason as
  * LongArrayDot: the HOF spelling (indexed transform + element_at +
  * aggregate) is interpreted, allocates per row, and chained-HOF
  * forms are corruption-prone on Spark 4.1; this emits one tight
  * primitive loop inside whole-stage codegen, and the interpreted
  * eval computes the identical sum.
  */
case class PqAdcSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if k > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_sum expects two array<bigint> and k > 0, got ${left.dataType} / ${right.dataType} / k=$k")
    }
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    var s = 0L
    var m = 0
    val n = codes.numElements()
    while (m < n) { s += lut.getLong(m * k + codes.getLong(m).toInt); m += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      s"""
         |int $n = $codes.numElements();
         |${ev.value} = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  ${ev.value} += $lut.getLong($m * $k + (int) $codes.getLong($m));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecExpressions {
  import org.apache.spark.sql.GraftColumnBridge

  def longArrayDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def pqAdcSum(codes: Column, lut: Column, k: Int): Column =
    GraftColumnBridge.column(
      PqAdcSum(GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut), k))
}
