package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic EXEMPLAR samples — the drill-down member of the
  * persisted-sketch family (#6, after HLL distinct, Misra–Gries heavy
  * hitters, fixed-bin histograms, theta set algebra, KLL quantiles).
  * The five existing families answer "did the distribution move?";
  * none can answer the question a fired drift breaker raises next:
  * "show me what the rows LOOK like". An exemplar sample stores k
  * whole example rows per group/version, chosen by BOTTOM-K-BY-HASH:
  * keep the k rows whose hash string sorts smallest.
  * `md5(cast(key as string))` is the supported hash: it is uniform,
  * every engine renders the identical lowercase hex, and — critically —
  * hex is FIXED-WIDTH, so lexicographic string order equals numeric
  * hash order (the uniformity argument) and [[Exemplar.kmvEstimate]]
  * can read the leading nibbles as a fraction. A different hash must
  * preserve both properties: render it as fixed-width unsigned hex
  * (e.g. `format_string("%016x", ...)` over an unsigned reading), NOT
  * as a decimal string — variable-length signed decimals sort "10…"
  * before "9" and cluster negatives, destroying uniformity, and their
  * digits misread as hex in the KMV estimator.
  *
  * Why hash-ordered rather than random: the sample is a PURE FUNCTION
  * of the key set — deterministic across retries and engines (no RNG,
  * no seed plumbing), uniform (a cryptographic/avalanche hash is
  * uniform over keys), and MERGEABLE with no error term:
  * `bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B))` exactly, so
  * per-version/per-window stored exemplars roll up to the corpus
  * sample without rescanning anything — the mergeable-summaries
  * contract the whole family shares, here with zero approximation.
  * The same k smallest normalized hashes also make the sample a KMV
  * distinct-count estimator, a free side reading.
  *
  * Scale shape: a GLOBAL bottom-k over a table needs no aggregate at
  * all — `ORDER BY h LIMIT k` is Spark's TakeOrderedAndProject
  * (per-partition bounded heaps, no shuffle, driver merges k-sized
  * lists); [[graft.ops.Profiling.exemplarSample]] composes exactly
  * that. This aggregate exists for the shapes composition can't reach:
  * per-GROUP samples in one hash-agg pass and per-WINDOW samples in
  * Structured Streaming, where state must be bounded — the buffer
  * holds ≤ k (hash, payload) pairs per group, ~k·(row size) bytes at
  * the exchange, map-side combine absorbs the raw stream. */
object Exemplar {

  /** Bottom-k exemplars as `array<struct<h, payload>>`, ascending by
    * (h, payload). `h` must be a precomputed uniform hash rendered as
    * a string; ties on h keep the smaller payload first (total order →
    * deterministic under any merge schedule). Null h or payload rows
    * are skipped. */
  def exemplarAgg(h: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      ExemplarAgg(GraftSqlBridge.expression(h),
        GraftSqlBridge.expression(payload), k).toAggregateExpression())

  /** KMV distinct-count estimate read from a stored exemplar sample —
    * the free side reading: the k smallest uniform hashes of a key set
    * are exactly a KMV (k-minimum-values) sketch, so
    * `(k − 1) / u_k` — with `u_k` the kth smallest hash normalized to
    * [0, 1) — is the standard unbiased distinct estimator
    * (rse ≈ 1/√(k−2)). A sample SMALLER than k saw every distinct key,
    * so the answer degrades to the EXACT count (the sample size).
    * `u_k` reads the first 15 hex nibbles of the kth hash as a 60-bit
    * fraction — beyond double precision's 53-bit mantissa the extra
    * nibbles are noise anyway. Pure column composition over the
    * `array<struct<h, payload>>` the aggregate/profile stores; k must
    * be the k the sample was BUILT with (a larger k would read a
    * missing element, a smaller one misnormalizes the order
    * statistic). */
  def kmvEstimate(exemplars: Column, k: Int): Column = {
    require(k >= 2, s"kmvEstimate needs k >= 2 (rse ~ 1/sqrt(k-2)), got $k")
    import org.apache.spark.sql.functions._
    val u = conv(substring(element_at(exemplars, k).getField("h"), 1, 15),
      16, 10).cast("double") / lit(math.pow(16.0, 15))
    when(size(exemplars) < k, size(exemplars).cast("double"))
      .otherwise(lit((k - 1).toDouble) / u)
  }
}

/** `exemplar_agg(h, payload, k)`: bounded bottom-k-by-hash sample.
  * See [[Exemplar]] for the determinism/merge contract. The buffer is
  * a sorted set capped at k; serialization is length-prefixed UTF-8
  * (payloads are whole serialized rows — `writeUTF`'s 64 KB cap would
  * truncate real documents). */
case class ExemplarAgg(
    hash: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[String, String]] {

  require(k >= 1 && k <= 100000,
    s"exemplar_agg k must be in [1, 100000], got $k")

  override def children: Seq[Expression] = Seq(hash, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", StringType, nullable = false),
    StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "exemplar_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, payload.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (h, p) => TypeCheckResult.TypeCheckFailure(
        "exemplar_agg requires (string hash, string payload), got " +
          s"(${h.catalogString}, ${p.catalogString})")
    }

  // TreeMap key = hash; a genuine h collision keeps the SMALLEST
  // payload for that h (uniform 128-bit hex makes collisions
  // vanishing, and the tie-break is still a pure function of the
  // input set, preserving determinism and mergeability)
  override def createAggregationBuffer(): java.util.TreeMap[String, String] =
    new java.util.TreeMap[String, String]()

  private def insert(
      buf: java.util.TreeMap[String, String],
      h: String, p: String): Unit = {
    // skip early: a value sorting past a FULL buffer's max can't enter
    if (buf.size() >= k) {
      val last = buf.lastEntry()
      val c = h.compareTo(last.getKey)
      if (c > 0 || (c == 0 && p.compareTo(last.getValue) >= 0)) return
    }
    val prev = buf.get(h)
    if (prev == null || p.compareTo(prev) < 0) buf.put(h, p)
    if (buf.size() > k) buf.remove(buf.lastKey())
  }

  override def update(
      buf: java.util.TreeMap[String, String],
      input: InternalRow): java.util.TreeMap[String, String] = {
    val h = hash.eval(input)
    val p = payload.eval(input)
    if (h != null && p != null) insert(buf, h.toString, p.toString)
    buf
  }

  override def merge(
      buf: java.util.TreeMap[String, String],
      other: java.util.TreeMap[String, String]): java.util.TreeMap[String, String] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[String, String]): Any = {
    val rows = new Array[Any](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = InternalRow(
        UTF8String.fromString(e.getKey), UTF8String.fromString(e.getValue))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeMap[String, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val hb = e.getKey.getBytes("UTF-8")
      val pb = e.getValue.getBytes("UTF-8")
      out.writeInt(hb.length); out.write(hb)
      out.writeInt(pb.length); out.write(pb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val hb = new Array[Byte](in.readInt()); in.readFully(hb)
      val pb = new Array[Byte](in.readInt()); in.readFully(pb)
      // partials are already ≤ k and internally deduped; insert keeps
      // the cap and tie-break invariants anyway (defensive)
      insert(buf, new String(hb, "UTF-8"), new String(pb, "UTF-8"))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ExemplarAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExemplarAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExemplarAgg =
    copy(hash = newChildren(0), payload = newChildren(1))
}
