package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin, Lang, Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS 2016; the Apache DataSketches KLL
  * implementation shipped with Spark): mergeable RANK/QUANTILE
  * sketches — the fifth persisted-sketch family (HLL distinct = q129,
  * Misra–Gries heavy hitters = q132, fixed-bin distributions = q133,
  * theta set algebra = q139/q141). The fixed-bin histogram family
  * answers quantiles only inside a [lo, hi) range DECLARED UP FRONT;
  * KLL needs no range at all — "p99 latency per segment, rolled up
  * over a year of stored per-day sketches" works when nobody knew the
  * value range at write time, which is the common case for profiling
  * raw corpus columns (token counts, document lengths, prices).
  *
  * Error contract (rank space, the KLL guarantee): a sketch with
  * parameter k bounds NORMALIZED RANK error — |est_rank(v) − r(v)| ≤
  * ε with 99% confidence, ε ≈ 1.65% at the default k=200 — and the
  * bound is preserved under merge. Value-space error is deliberately
  * unbounded (a quantile lands on a RETAINED item); audits must
  * therefore check the rank of the returned value, never the value
  * itself (q144 does exactly this). `n` is exact — KLL counts every
  * update — so the stored sketch doubles as an exact row counter.
  * Compaction uses random coin flips, so two builds of the same data
  * may differ bitwise while both honoring the band: battery coverage
  * is a violations relation over the band, never a hash of estimates
  * (the theta/MG pattern).
  *
  * Scale shape: one ≤~(3k)-item buffer per group per executor partial,
  * ≤ ~8·3k bytes per group through the exchange (map-side combine
  * absorbs the raw stream); the merge aggregate reads STORED bytes
  * only, so corpus-wide quantile rollups never rescan rows. */
object KllSketch {

  /** DataSketches' own default: ε ≈ 1.65% normalized rank error. */
  val DefaultK = 200

  /** Aggregate a double column into a KLL sketch (binary). */
  def kllSketch(value: Column, k: Int = DefaultK): Column =
    GraftSqlBridge.column(
      KllSketchAgg(GraftSqlBridge.expression(value), k)
        .toAggregateExpression())

  /** Merge STORED sketches (a binary column) into one sketch. Unlike
    * theta intersection, the empty merge IS representable (the empty
    * sketch), so this always yields bytes. With no k given, the buffer
    * ADOPTS the inputs' k (adaptK), preserving stored accuracy; see
    * [[KllMergeAgg]] for the merge-takes-min-k accuracy contract. */
  def kllMerge(sketch: Column): Column =
    GraftSqlBridge.column(
      KllMergeAgg(GraftSqlBridge.expression(sketch), DefaultK,
        adaptK = true).toAggregateExpression())

  /** As above with an EXPLICIT k: the caller's k governs, capping
    * merged accuracy at k even for higher-k inputs (deliberate
    * downsizing). */
  def kllMerge(sketch: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllMergeAgg(GraftSqlBridge.expression(sketch), k)
        .toAggregateExpression())

  /** Value at normalized rank `q` ∈ [0, 1] of a stored sketch
    * (inclusive semantics: the smallest retained value whose rank of
    * `<=` mass reaches q). Null for an empty sketch. */
  def kllQuantile(sketch: Column, q: Column): Column =
    GraftSqlBridge.column(KllQuantile(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(q)))

  /** Normalized rank of `value` (fraction of the stream `<=` it).
    * Null for an empty sketch. */
  def kllRank(sketch: Column, value: Column): Column =
    GraftSqlBridge.column(KllRank(
      GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(value)))

  /** EXACT number of values the sketch absorbed. */
  def kllN(sketch: Column): Column =
    GraftSqlBridge.column(KllN(GraftSqlBridge.expression(sketch)))

  /** Items the sketch physically retains; equal to [[kllN]] iff the
    * sketch never compacted (exact mode — quantiles are order
    * statistics, KS deltas deterministic). */
  def kllRetained(sketch: Column): Column =
    GraftSqlBridge.column(KllRetained(GraftSqlBridge.expression(sketch)))

  /** Kolmogorov–Smirnov distance between two STORED sketches — the
    * drift kernel for metrics with no declared range (the KLL-family
    * analogue of `hist_psi`, which needs both profiles on one shared
    * binning declared up front): max |F₁(x) − F₂(x)| over the union of
    * retained items, from bytes alone. Null if either side is empty. */
  def kllKs(a: Column, b: Column): Column =
    GraftSqlBridge.column(KllKsDelta(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Rejection threshold for [[kllKs]] at significance `p`: drift is
    * DETECTED iff `kll_ks(a, b) > kll_ks_threshold(a, b, p)`. The
    * threshold accounts for both sampling noise (the classic
    * two-sample KS term, shrinking with the sketches' exact n) and
    * both sketches' rank error — so the same test is sound on exact
    * and estimation-mode sketches. Null if either side is empty. */
  def kllKsThreshold(a: Column, b: Column, p: Column): Column =
    GraftSqlBridge.column(KllKsThreshold(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(p)))
}

/** Static kernels the expressions (and their generated code) call. */
object KllKernel {

  // heapify returns a read-only view of the compact image for queries;
  // merging into a fresh updatable instance is the write path
  def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  def fold(into: KllDoublesSketch, bytes: Array[Byte]): Unit =
    into.merge(wrap(bytes))

  /** null (boxed) on empty — an empty stream has no quantiles. */
  def quantile(bytes: Array[Byte], q: Double): Any = {
    require(q >= 0.0 && q <= 1.0,
      s"kll_quantile rank must be in [0, 1], got $q")
    val sk = wrap(bytes)
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }

  def rank(bytes: Array[Byte], v: Double): Any = {
    val sk = wrap(bytes)
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getRank(v, QuantileSearchCriteria.INCLUSIVE))
  }

  def n(bytes: Array[Byte]): Long = wrap(bytes).getN

  /** Items physically retained; == n iff never compacted (exact mode). */
  def retained(bytes: Array[Byte]): Long = wrap(bytes).getNumRetained.toLong

  /** null (boxed) if either sketch is empty — an empty stream has no
    * CDF to compare. */
  def ksDelta(a: Array[Byte], b: Array[Byte]): Any = {
    val (sa, sb) = (wrap(a), wrap(b))
    if (sa.isEmpty || sb.isEmpty) null
    else java.lang.Double.valueOf(
      org.apache.datasketches.quantilescommon.KolmogorovSmirnov
        .computeKSDelta(sa, sb))
  }

  def ksThreshold(a: Array[Byte], b: Array[Byte], p: Double): Any = {
    require(p > 0.0 && p < 1.0,
      s"kll_ks_threshold significance must be in (0, 1), got $p")
    val (sa, sb) = (wrap(a), wrap(b))
    if (sa.isEmpty || sb.isEmpty) null
    else java.lang.Double.valueOf(
      org.apache.datasketches.quantilescommon.KolmogorovSmirnov
        .computeKSThreshold(sa, sb, p))
  }
}

/** `kll_sketch_agg(value[, k])`: raw doubles → KLL sketch bytes. The
  * buffer is the live updatable sketch; serialization to the compact
  * image happens only at exchange boundaries. Null and NaN values are
  * skipped (NaN has no rank — admitting it would poison the order). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires double (cast the value), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buffer.update(d)
    }
    buffer
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // merge into a fresh updatable instance: heapified compact images
    // answer queries but must not be the mutable buffer
    val sk = createAggregationBuffer()
    KllKernel.fold(sk, bytes)
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** `kll_merge_agg(sk[, k])` over STORED sketch bytes — the persisted-
  * sketch read side. Rows here are stored sketches (a handful per
  * group), so the per-row heapify is off the hot path by construction.
  * Null bytes are skipped; zero inputs yield the EMPTY sketch (the
  * merge identity is representable, unlike theta intersection's
  * universe), whose quantile/rank reads are null.
  *
  * ACCURACY UNDER MERGE (r16 advice): DataSketches' merge takes the
  * MINIMUM k across everything it touches — including this aggregate's
  * own buffer — so a fixed buffer k silently downgrades higher-k
  * stored sketches, one-way. Two modes:
  *  - `adaptK = true` (the no-explicit-k SQL/Scala form): the buffer
  *    adopts the first input sketch's k (and partials re-heapify at
  *    their own k), so merging same-k stored sketches preserves their
  *    accuracy with no k to remember. Mixed-k inputs still land at the
  *    inputs' min k — that is the information-theoretic bound, not a
  *    buffer artifact.
  *  - explicit k (`adaptK = false`): the caller's k governs, capping
  *    merged accuracy at k even when inputs were built higher — pass a
  *    k matching the stored sketches (or omit it) when that loss is
  *    not intended. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    adaptK: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"kll k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires binary (a stored kll sketch), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = KllKernel.wrap(v.asInstanceOf[Array[Byte]])
      // adaptK: an untouched buffer adopts the first input's k so the
      // buffer's own default never caps stored-sketch accuracy
      val b = if (adaptK && buffer.isEmpty && in.getK > buffer.getK)
        KllDoublesSketch.newHeapInstance(in.getK)
      else buffer
      b.merge(in)
      b
    }
  }

  override def merge(
      buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch =
    // same adoption on the combine side: folding a higher-k partial into
    // an untouched buffer must not downgrade it
    if (adaptK && buffer.isEmpty && other.getK > buffer.getK) {
      other.merge(buffer)
      other
    } else {
      buffer.merge(other)
      buffer
    }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val in = KllKernel.wrap(bytes)
    // adaptK: re-heapify the partial at its own k — a fixed-k buffer
    // here would claw back the accuracy update() just preserved
    val sk = KllDoublesSketch.newHeapInstance(
      if (adaptK) math.max(k, in.getK) else k)
    sk.merge(in)
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** `kll_quantile(sk, q)`: value at normalized rank q of stored bytes;
  * null for the empty sketch. q outside [0, 1] refuses loudly. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(sk: Any, q: Any): Any =
    KllKernel.quantile(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, q) => {
      val r = ctx.freshName("kllQ")
      s"""
      Object $r = graft.functions.KllKernel.quantile($sk, $q);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sk, v)`: normalized rank (fraction `<=` v) from stored
  * bytes; null for the empty sketch. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_rank requires (binary, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_rank"

  override protected def nullSafeEval(sk: Any, v: Any): Any =
    KllKernel.rank(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) => {
      val r = ctx.freshName("kllR")
      s"""
      Object $r = graft.functions.KllKernel.rank($sk, $v);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_ks(a, b)`: Kolmogorov–Smirnov distance between two stored
  * sketches — max |F₁(x) − F₂(x)| over the union of retained items,
  * computed from bytes alone; null if either sketch is empty. */
case class KllKsDelta(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_ks requires (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_ks"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KllKernel.ksDelta(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("kllKs")
      s"""
      Object $r = graft.functions.KllKernel.ksDelta($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_ks_threshold(a, b, p)`: rejection threshold for [[KllKsDelta]]
  * at significance `p` — covers two-sample sampling noise (shrinking
  * with each sketch's exact n) PLUS both sketches' rank error, so
  * `kll_ks(a,b) > kll_ks_threshold(a,b,p)` is a sound drift test in
  * exact and estimation mode alike. Null if either sketch is empty. */
case class KllKsThreshold(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, BinaryType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, p) => TypeCheckResult.TypeCheckFailure(
        s"kll_ks_threshold requires (binary, binary, double), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${p.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_ks_threshold"

  override protected def nullSafeEval(a: Any, b: Any, p: Any): Any =
    KllKernel.ksThreshold(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, p) => {
      val r = ctx.freshName("kllKsT")
      s"""
      Object $r = graft.functions.KllKernel.ksThreshold($a, $b, $p);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `kll_n(sk)`: EXACT update count of a stored sketch — KLL tracks n
  * precisely, so the profile row doubles as an exact row count. */
case class KllN(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_n requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"

  override protected def nullSafeEval(input: Any): Any =
    KllKernel.n(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.KllKernel.n($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `kll_retained(sk)`: number of items the sketch physically retains.
  * `retained == kll_n` iff the sketch has never compacted — i.e. it is
  * still in EXACT mode and its quantiles are order statistics, its KS
  * deltas deterministic. Audits whose premises are exact-mode-only
  * (q145's order-statistic bands, q148's independent-rebuild parity)
  * gate on this instead of assuming the fixture stays small (r16
  * advice); it is also the memory-sizing introspection DataSketches
  * itself exposes. */
case class KllRetained(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_retained requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "kll_retained"

  override protected def nullSafeEval(input: Any): Any =
    KllKernel.retained(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.KllKernel.retained($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
