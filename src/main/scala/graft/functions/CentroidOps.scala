package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid/codebook kernels for the IVF family whose model parameters
  * travel as a BROADCAST, not as expression-tree literals.
  *
  * Why not `typedLit` per centroid (the LSH planes' pattern)? Scale of
  * the parameter block. LSH planes are ~16 KB — fine as literals. IVF
  * centroids are `nlist × dim` doubles: already ~450 KB per usage at
  * nlist≈900/dim 64 (the sf0.1 sqrt-derived default), and the recall
  * gate's union plan stacked enough copies to push task binaries past
  * Spark's 1 MiB warning; at the nlist=4096 / dim≈1k end of the
  * documented envelope literals would be tens of MB per stage — fatal.
  * A `Broadcast` serializes into the task binary as a HANDLE; executors
  * fetch the block once and every task reuses it.
  *
  * Execution shape: `CodegenFallback`, deliberately. The per-row work is
  * the nlist×dim (or m×ksub×dsub) multiply-add loop itself — thousands
  * of FLOPs — so the one virtual `eval` call the fallback adds per row
  * is noise, while the surrounding stage stays inside whole-stage
  * codegen. Arithmetic is IDENTICAL to the literal formulation these
  * kernels replaced (sequential double multiply-add over the vector,
  * null elements read as 0 — [[VecDot]]'s contract; ties break on the
  * lower index), so trained centroids, cell assignments, and therefore
  * every battery result are bit-for-bit unchanged.
  */
object CentroidOps {

  private[functions] def toDoubles(
      arr: ArrayData, float: Boolean): Array[Double] = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) =
        if (arr.isNullAt(i)) 0.0
        else if (float) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      i += 1
    }
    v
  }

  private[functions] def dot(v: Array[Double], c: Array[Double]): Double = {
    val n = math.min(v.length, c.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += v(i) * c(i); i += 1 }
    s
  }

  private def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name requires an array<float|double> vector, got ${t.catalogString}")
    }

  private def isFloatVec(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Top-`k` centroid ids for a vector, ranked by dot product descending
    * (== cosine against unit-norm centroids), ties to the lower cell id.
    * `k = 1` is cell assignment; `k = nprobe` is query probing. */
  case class NearestCells(
      child: Expression,
      bc: Broadcast[Array[Array[Double]]],
      k: Int)
    extends UnaryExpression with CodegenFallback {

    require(k >= 1, s"k must be >= 1, got $k")

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_cells"

    override protected def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData], isFloatVec(child))
      val cents = bc.value
      val nl = cents.length
      val scores = new Array[Double](nl)
      var c = 0
      while (c < nl) { scores(c) = dot(v, cents(c)); c += 1 }
      val kk = math.min(k, nl)
      val out = new Array[Int](kk)
      val taken = new Array[Boolean](nl)
      var r = 0
      while (r < kk) {
        var best = -1
        var c2 = 0
        while (c2 < nl) {
          // strict > keeps the LOWEST index on ties — the (dot DESC,
          // cell ASC) order of the struct sort this replaces
          if (!taken(c2) &&
              (best < 0 || java.lang.Double.compare(scores(c2), scores(best)) > 0))
            best = c2
          c2 += 1
        }
        taken(best) = true
        out(r) = best
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Product-quantization codes: for each of the `m` `dsub`-wide
    * subspaces, the codebook entry minimizing L2 distance
    * (`‖e‖² − 2x·e` — `‖x‖²` is entry-invariant), ties to the lower
    * code. Codebooks broadcast as `m × ksub × dsub`; squared entry
    * norms are derived once per executor (lazy val on the fetched
    * block's wrapper). */
  case class PqEncode(
      child: Expression,
      bc: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    // per-JVM cache of the entry norms: computed from the broadcast
    // block once per executor, not per row
    @transient private lazy val books = bc.value
    @transient private lazy val e2: Array[Array[Double]] =
      books.map(_.map(e => { var s = 0.0; var i = 0; while (i < e.length) { s += e(i) * e(i); i += 1 }; s }))

    override protected def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData], isFloatVec(child))
      val m = books.length
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val book = books(j)
        val dsub = if (book.isEmpty) 0 else book(0).length
        val base = j * dsub
        var bestCode = 0
        var bestD = Double.MaxValue
        var kk = 0
        while (kk < book.length) {
          val e = book(kk)
          var s = 0.0
          var i = 0
          val n = math.min(dsub, math.max(0, v.length - base))
          while (i < n) { s += v(base + i) * e(i); i += 1 }
          // full dot FIRST, then one fused subtract — the same floating-
          // point evaluation order as the `‖e‖² − 2·dot` column formula
          // this replaces, so codes are bit-identical to the literal path
          val d = e2(j)(kk) - 2.0 * s
          // strict < keeps the LOWEST code on ties — codeFor's order
          if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestCode = kk }
          kk += 1
        }
        out(j) = bestCode
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-query ADC lookup table: `lut[j][kk] = q_j · e_jk` over the
    * broadcast codebooks — `m × ksub` doubles per query row. */
  case class PqLut(
      child: Expression,
      bc: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child, prettyName)
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def prettyName: String = "pq_lut"

    override protected def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData], isFloatVec(child))
      val books = bc.value
      val m = books.length
      val luts = new Array[ArrayData](m)
      var j = 0
      while (j < m) {
        val book = books(j)
        val dsub = if (book.isEmpty) 0 else book(0).length
        val base = j * dsub
        val row = new Array[Double](book.length)
        var kk = 0
        while (kk < book.length) {
          val e = book(kk)
          var s = 0.0
          var i = 0
          val n = math.min(dsub, math.max(0, v.length - base))
          while (i < n) { s += v(base + i) * e(i); i += 1 }
          row(kk) = s
          kk += 1
        }
        luts(j) = new GenericArrayData(row)
        j += 1
      }
      new GenericArrayData(luts.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nearestCells(v: Column, bc: Broadcast[Array[Array[Double]]], k: Int): Column =
    GraftSqlBridge.column(NearestCells(GraftSqlBridge.expression(v), bc, k))

  def pqEncode(v: Column, bc: Broadcast[Array[Array[Array[Double]]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v), bc))

  def pqLut(v: Column, bc: Broadcast[Array[Array[Array[Double]]]]): Column =
    GraftSqlBridge.column(PqLut(GraftSqlBridge.expression(v), bc))
}
