package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) building blocks for
  * [[graft.sources.Sources.writeZOrdered]]: map each cluster column to
  * an equi-depth bucket index against sampled quantile boundaries
  * ([[QuantileBucket]], binary search — O(log buckets) per row, not a
  * linear HOF scan), then bit-interleave the indices into one curve
  * value ([[InterleaveBits]]) that a single `repartitionByRange` +
  * `sortWithinPartitions` can order by. Both are codegen'd so the
  * whole z-value computation stays inside one whole-stage-codegen span
  * of the layout write. */
object ZOrderExprs {

  def quantileBucket(value: Column, boundaries: Array[Double]): Column =
    GraftSqlBridge.column(
      QuantileBucket(GraftSqlBridge.expression(value), boundaries))

  def interleaveBits(indices: Seq[Column], bitsPerCol: Int): Column =
    GraftSqlBridge.column(
      InterleaveBits(indices.map(GraftSqlBridge.expression), bitsPerCol))
}

/** Equi-depth bucket index of a double against pre-computed sorted
  * quantile `boundaries` (length = buckets - 1): binary search, so a
  * value below the first boundary maps to 0 and one at/above the last
  * to `boundaries.length`. NULL (and NaN) map to bucket 0 — they sort
  * together at the curve's origin rather than poisoning the interleave
  * with nulls. The boundaries ride the expression itself (driver-side
  * array, a few KB), not a join. */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
  extends Expression {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket requires double (cast first), got ${t.catalogString}")
  }

  @transient private lazy val bounds: Array[Double] = boundaries

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else QuantileBucket.bucketOf(v.asInstanceOf[Double], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("bounds", bounds, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |int ${ev.value} = 0;
      |if (!${c.isNull}) {
      |  ${ev.value} = graft.functions.QuantileBucket.bucketOf(${c.value}, $boundsRef);
      |}""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object QuantileBucket {
  /** Shared by eval and generated code. NaN → 0 (curve origin). */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return 0
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i + 1 // exactly on a boundary → the bucket above it
    else -i - 1       // insertion point = count of boundaries below v
  }
}

/** Morton interleave of `children.size` non-null int bucket indices,
  * `bitsPerCol` bits each (indices are masked to that width): bit j of
  * child i lands at curve-bit `j * n + i`, so a range of curve values
  * covers a compact hyper-rectangle across ALL columns — the property
  * that makes one range-sort give every clustered column tight per-file
  * min/max stats. `n * bitsPerCol` must fit a signed long. */
case class InterleaveBits(children: Seq[Expression], bitsPerCol: Int)
  extends Expression {

  require(children.nonEmpty, "interleave_bits needs at least one column")
  require(children.size * bitsPerCol <= 62,
    s"${children.size} cols x $bitsPerCol bits exceeds a long's range")

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires int indices, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var i = 0
    while (i < n) {
      val raw = children(i).eval(input)
      val v = if (raw == null) 0 else raw.asInstanceOf[Int]
      var j = 0
      while (j < bitsPerCol) {
        z |= ((v >> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val z = ev.value
    val childCode = evals.map(_.code).reduce(_ + _)
    val perChild = evals.zipWithIndex.map { case (c, i) =>
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      s"""
         |int $v = ${c.isNull} ? 0 : (int) ${c.value};
         |for (int $j = 0; $j < $bitsPerCol; $j++) {
         |  $z |= ((long) (($v >> $j) & 1)) << ($j * $n + $i);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(code = childCode + code"""
      |long $z = 0L;
      |$perChild""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
