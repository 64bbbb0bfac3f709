package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over `array<float>` / `array<double>`.
  *
  * The similarity operators' hot path is a dot product per candidate
  * pair. Spark's higher-order functions (`zip_with` + `aggregate`)
  * express it declaratively but evaluate INTERPRETED — one closure call
  * per element, boxing every float — and sit outside whole-stage
  * codegen. This expression generates a tight primitive `for` loop
  * instead (`doGenCode`), keeping the scan → score → filter pipeline in
  * one codegen stage. Summation is sequential in document order, so
  * results are bit-identical to the HOF left-fold it replaces (and to
  * the DuckDB oracle's `list_dot_product`).
  *
  * Preference order per the Spark-first design: built-in functions, then
  * a native `Expression` with codegen (this), then — last — a Scala UDF
  * (per-row serialization, opaque to Catalyst).
  *
  * Null/shape contract: null input array → null; arrays are expected
  * element-dense (embedding vectors), mismatched lengths dot the common
  * prefix. Element nulls are read as 0 rather than poisoning the sum.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double l$i = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
         |  double r$i = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
         |  $s += l$i * r$i;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API entry: `dot(a, b)` as a codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
