package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A `(id, v)` element of a capped posting list. `v` carries whatever
  * per-doc payload the caller needs (set size, simhash, 0 when unused). */
final case class IdVal(id: Long, v: Long)

object CappedCollect {
  final case class Buf(items: Vector[IdVal])
}

/** `collect_list` with a hard size bound: keeps at most `cap + 1`
  * elements per group and silently stops accumulating beyond that.
  *
  * Why not `collect_list(...)` + `filter(size <= cap)`: the filter runs
  * AFTER the full list materializes, so one pathological hot key — a
  * boilerplate shingle shared by 10⁸ documents at 100 TB — assembles a
  * multi-GB array in a single aggregation buffer before being thrown
  * away. This aggregator bounds every buffer at cap+1 elements
  * (~16 bytes each) no matter how hot the key is; a downstream
  * `size(docs) <= cap` filter still correctly rejects over-cap groups
  * because overflow parks the size at exactly cap+1.
  *
  * Which elements survive in an over-cap group is partial-merge-order
  * dependent — irrelevant, those groups are dropped. Under-cap groups
  * always retain every element (list order is unordered, same as
  * `collect_list`).
  */
final class CappedCollect(cap: Int)
    extends Aggregator[IdVal, CappedCollect.Buf, Seq[IdVal]] {
  import CappedCollect.Buf

  override def zero: Buf = Buf(Vector.empty)

  override def reduce(b: Buf, in: IdVal): Buf =
    if (b.items.length > cap) b else Buf(b.items :+ in)

  override def merge(a: Buf, b: Buf): Buf =
    Buf((a.items ++ b.items).take(cap + 1))

  override def finish(b: Buf): Seq[IdVal] = b.items

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[IdVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[IdVal]]()
}
