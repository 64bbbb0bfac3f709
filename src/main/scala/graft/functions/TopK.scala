package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator over (score, id) pairs — the engine's UDAF
  * surface (SURVEY §2 Layer B "UDF/UDAF/UDTF").
  *
  * Scale design: this is a partial aggregate. Each executor keeps at most
  * `k` pairs per group in its hash map, `merge` combines two k-buffers, so
  * the shuffle for a global/grouped top-k carries `k × groups` rows instead
  * of the whole relation — the difference between a top-10 over 100 TB
  * being a map-side trim vs. a full global sort.
  *
  * Determinism: ordering is (score DESC, id ASC); ties on score are broken
  * by id, so the result is independent of partitioning and merge order
  * (callers should pre-round floating scores if they want cross-engine
  * reproducibility).
  */
final case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  // Double.compare, not > / ==: primitive NaN comparisons are all-false,
  // which breaks strict-weak ordering (sortWith may throw "Comparison
  // method violates its general contract!" nondeterministically).
  // Double.compare is a total order; NaN sorts above +Infinity (Java
  // semantics), deterministically.
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  // buf is kept sorted (better-first), so reduce is an O(k) bounded
  // insert, not an O(k log k) re-sort per input row
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && better(buf.last, in)) buf
    else {
      val i = buf.indexWhere(b => better(in, b))
      val ins = if (i < 0) buf :+ in else (buf.take(i) :+ in) ++ buf.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }
  }
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    trim(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = trim(r)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}

object TopK {
  /** Column form: `groupBy(...).agg(TopK.topK(5).name("topk"))` over a
    * Dataset[ScoredId]-shaped input. */
  def topK(k: Int): TypedColumn[ScoredId, Seq[ScoredId]] =
    new TopKAggregator(k).toColumn
}
