package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: zlib-deflated size over raw UTF-8
  * size per document — the `compression_ratio` member of the CCNet /
  * RedPajama-V2 quality-signal family (Wenzek et al. 2019; repetitive
  * boilerplate and templated spam compress far below organic prose, so
  * pipelines gate on the ratio from both ends). Deflate with a FIXED
  * level is deterministic for a given input, which is what lets the
  * battery audit invariants on it; the zlib stream framing (~6 bytes +
  * 5 bytes/16K block) is included, so tiny inputs can exceed 1.0 —
  * callers gate on a length floor like every public pipeline does.
  *
  * Scale shape: a narrow per-row expression inside whole-stage codegen
  * (the generated code calls [[DeflateKernel]] directly — no UDF
  * ser/de, no fallback), zero shuffles; one `Deflater` per executor
  * thread, reused via reset() across rows, so a 100 TB scan allocates
  * nothing per row but the output buffer view. */
object CompressExprs {

  def deflateRatio(text: Column, level: Int = 6): Column =
    GraftSqlBridge.column(DeflateRatio(GraftSqlBridge.expression(text), level))
}

/** Thread-local deflate worker the codegen'd expression calls into. */
object DeflateKernel {

  private val worker = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater()
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** zlib-compressed byte count of `s` at `level` (1–9). */
  def deflatedSize(s: UTF8String, level: Int): Long = {
    val bytes = s.getBytes
    val d = worker.get()
    // setLevel takes effect at the NEXT reset (Deflater javadoc)
    d.setLevel(level)
    d.reset()
    d.setInput(bytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }

  /** deflated/raw ratio; empty input reports 1.0 (nothing to judge). */
  def ratio(s: UTF8String, level: Int): Double = {
    val raw = s.numBytes()
    if (raw == 0) 1.0 else deflatedSize(s, level).toDouble / raw
  }
}

/** `deflate_ratio(text[, level])`: see [[CompressExprs]]. `level` is a
  * construction parameter (it selects the deflate search effort the
  * generated code runs with), so the SQL surface takes it as an integer
  * literal like every other kernel config argument. */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression {

  require(level >= 1 && level <= 9,
    s"deflate_ratio: level must be in [1, 9], got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.ratio(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateKernel.ratio($a, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
