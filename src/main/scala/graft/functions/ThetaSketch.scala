package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Dasgupta et al., "Theta-Sketch Framework", 2016;
  * the Apache DataSketches KMV generalization): mergeable distinct-
  * count sketches CLOSED UNDER SET ALGEBRA — union, intersection, and
  * difference of STORED sketches are themselves sketches with known
  * error. This is the set-operation member of the persisted-sketch
  * family (q129 HLL = plain distinct rollup, q132 Misra–Gries = heavy
  * hitters, q133 fixed-bin = distributions): HLL unions fine but
  * cannot intersect, so "distinct users in segment A AND B" over
  * per-segment stored sketches is exactly the query theta exists for.
  *
  * Error contract: a sketch built with `lgK` keeps ~2^lgK entries;
  * relative standard error of a single sketch or union ≈
  * 1/sqrt(2^lgK) (~1.6% at the default lgK=12). Intersection error
  * grows with |A∪B|/|A∩B| (Theta framework §4) — small overlaps of
  * large sets estimate loosely, which the q139 audit bounds
  * explicitly.
  *
  * Scale shape: the raw-value aggregate keeps ONE ≤2^lgK-entry Union
  * gadget per group per executor partial and ships ≤(16·2^lgK+24)
  * bytes per group through the exchange (map-side combine absorbs the
  * raw stream); the merge aggregates read only stored sketch BYTES —
  * rollups over a year of daily segment sketches never rescan rows. */
object ThetaSketch {

  val DefaultLgK = 12

  /** Aggregate a string column into a compact theta sketch (binary). */
  def thetaSketch(item: Column, lgK: Int = DefaultLgK): Column =
    GraftSqlBridge.column(
      ThetaSketchAgg(GraftSqlBridge.expression(item), lgK)
        .toAggregateExpression())

  /** Union STORED sketches (a binary column) into one sketch. */
  def thetaUnion(sketch: Column, lgK: Int = DefaultLgK): Column =
    GraftSqlBridge.column(
      ThetaSetAgg(GraftSqlBridge.expression(sketch), lgK,
        intersect = false).toAggregateExpression())

  /** Intersect STORED sketches (a binary column) into one sketch —
    * the query HLL structurally cannot answer. Empty input → null. */
  def thetaIntersect(sketch: Column, lgK: Int = DefaultLgK): Column =
    GraftSqlBridge.column(
      ThetaSetAgg(GraftSqlBridge.expression(sketch), lgK,
        intersect = true).toAggregateExpression())

  /** Distinct-count estimate of a stored sketch. */
  def thetaEstimate(sketch: Column): Column =
    GraftSqlBridge.column(ThetaEstimate(GraftSqlBridge.expression(sketch)))

  /** Set difference a \ b of two stored sketches, as a sketch. */
  def thetaANotB(a: Column, b: Column): Column =
    GraftSqlBridge.column(ThetaANotB(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Static kernels the expressions (and their generated code) call. */
object ThetaKernel {

  def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).toByteArray
}

/** `theta_sketch_agg(item[, lgK])`: raw values → compact theta sketch.
  * The buffer is the live Union gadget (≤2^lgK retained hashes however
  * many rows stream through); serialization to compact bytes happens
  * only at exchange boundaries, exactly like Spark's own
  * `hll_sketch_agg`. Null items are skipped. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires string (cast the item), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaKernel.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** `theta_union_agg` / `theta_intersect_agg` over STORED sketch bytes —
  * the persisted-sketch read side. The buffer is (result-so-far,
  * seen-anything): for intersection the empty state is the identity
  * (the universe), which cannot be represented as a sketch, so the
  * flag distinguishes "no input yet" from a real partial everywhere a
  * partition may be empty. Rows here are stored sketches (a handful
  * per group), so the per-row SetOperation gadget is off the hot path
  * by construction. Null sketch bytes are skipped; an all-null /
  * empty intersection group evals to null. */
case class ThetaSetAgg(
    child: Expression,
    lgK: Int,
    intersect: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaSetAgg.Buf] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (intersect) "theta_intersect_agg" else "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary (a stored theta sketch), got ${t.catalogString}")
  }

  private def combine(a: CompactSketch, b: CompactSketch): CompactSketch =
    if (intersect) {
      val i = SetOperation.builder().setLogNominalEntries(lgK)
        .buildIntersection()
      i.intersect(a); i.intersect(b); i.getResult
    } else {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      u.union(a); u.union(b); u.getResult
    }

  private def fold(buffer: ThetaSetAgg.Buf, sk: CompactSketch): ThetaSetAgg.Buf = {
    buffer.cur = if (buffer.cur == null) sk else combine(buffer.cur, sk)
    buffer
  }

  override def createAggregationBuffer(): ThetaSetAgg.Buf =
    new ThetaSetAgg.Buf(null)

  override def update(
      buffer: ThetaSetAgg.Buf, input: InternalRow): ThetaSetAgg.Buf = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, ThetaKernel.wrap(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      buffer: ThetaSetAgg.Buf, other: ThetaSetAgg.Buf): ThetaSetAgg.Buf =
    if (other.cur == null) buffer else fold(buffer, other.cur)

  override def eval(buffer: ThetaSetAgg.Buf): Any =
    if (buffer.cur == null) null else buffer.cur.toByteArray

  // serialized partial: 1 empty-marker byte, else the sketch bytes
  override def serialize(buffer: ThetaSetAgg.Buf): Array[Byte] =
    if (buffer.cur == null) Array[Byte](0)
    else buffer.cur.toByteArray

  override def deserialize(bytes: Array[Byte]): ThetaSetAgg.Buf =
    if (bytes.length == 1 && bytes(0) == 0) new ThetaSetAgg.Buf(null)
    else new ThetaSetAgg.Buf(ThetaKernel.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): ThetaSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSetAgg =
    copy(child = newChildren.head)
}

object ThetaSetAgg {
  /** Mutable fold state: null = identity (union: ∅; intersect: U). */
  final class Buf(var cur: CompactSketch)
}

/** `theta_estimate(sketch)`: distinct-count estimate of stored bytes. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(input: Any): Any =
    ThetaKernel.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ThetaKernel.estimate($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `theta_a_not_b(a, b)`: set difference of two stored sketches. */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"theta_a_not_b requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernel.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaKernel.aNotB($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
