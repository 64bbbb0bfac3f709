package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items (heavy hitters) sketch — Misra–Gries with
  * the batched trim of Agarwal et al., "Mergeable Summaries" (PODS
  * 2012): the summary is a counter map of at most `capacity` items;
  * overflow subtracts the (capacity+1)-th largest count from every
  * counter and drops the non-positive ones (one trim = `capacity`
  * classic MG decrement rounds at once, amortized O(1) per input).
  *
  * Guarantees, preserved under ARBITRARY merge trees (that is the
  * paper's point, and what makes this a partial aggregate Spark can
  * map-side combine): for every item with true count `t` over `n`
  * non-null inputs, the sketch's estimate `e` satisfies
  * `t - n/(capacity+1) <= e <= t`, and every item with
  * `t > n/(capacity+1)` is PRESENT in the summary. The q128 battery
  * audit replays both bounds against exact counts.
  *
  * Scale design (SURVEY §2 Layer B "UDF/UDAF/UDTF"): each executor's
  * partial holds at most ~2×capacity counters regardless of input
  * size, the shuffle carries one ≤capacity-entry map per partition per
  * group, and the final merge is capacity-bounded — a corpus-wide
  * "most frequent tokens/domains/urls" over 100 TB costs one narrow
  * scan plus a constant-size exchange, where an exact groupBy would
  * shuffle every distinct item. Which SUB-threshold items survive (and
  * their exact estimates) depends on merge order, so downstream use is
  * the audited contract — membership of the guaranteed-heavy items and
  * the two-sided count bound — never the raw tail.
  *
  * Determinism note for tests/oracles: the INVARIANTS are
  * partitioning-independent; the raw map is not. Battery entries emit
  * invariant violations (an empty relation), OpsSpec pins the bounds
  * across different partitionings.
  */
class FrequentItemsAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")
  require(capacity <= FrequentItems.MaxCapacity,
    s"capacity $capacity exceeds ${FrequentItems.MaxCapacity}: the summary " +
      "lives in executor memory per group per partition (~2x capacity " +
      "entries) - a heavy-hitters profile past 1M counters wants the exact " +
      "groupBy, not a sketch")
  import FrequentItems.{mgMerge, mgTrim}

  override def zero: Map[String, Long] = Map.empty

  // grow to 2×capacity between trims: each trim is O(size log size), so
  // amortized cost per input stays O(1) instead of O(capacity)
  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) b
    else {
      val grown = b.updated(x, b.getOrElse(x, 0L) + 1L)
      if (grown.size > 2 * capacity) mgTrim(grown, capacity) else grown
    }

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    mgMerge(a, b, capacity)

  override def finish(r: Map[String, Long]): Map[String, Long] =
    mgTrim(r, capacity)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

/** Roll up STORED Misra–Gries summaries (the `map<string,bigint>`
  * column [[FrequentItemsAggregator]] emits) without rescanning raw
  * rows — the persisted-sketch warehouse pattern (q129's HLL shape,
  * for heavy hitters): keep one summary per partition/day/shard, and
  * answer corpus-level "most frequent" queries by merging the stored
  * maps. The mergeable-summaries theorem (Agarwal 2012 §3) is exactly
  * that this loses nothing: a merge of per-substream summaries carries
  * the SAME `t - n/(cap+1) <= e <= t` band over the concatenated
  * stream as a direct one-pass summary — unlike q129's HLL union,
  * which pays a ~1% re-estimation drift. Null inputs (empty groups)
  * are identity. */
class FrequentItemsMergeAggregator(capacity: Int)
    extends Aggregator[
      Map[String, Long], Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")
  require(capacity <= FrequentItems.MaxCapacity,
    s"capacity $capacity exceeds ${FrequentItems.MaxCapacity} (see " +
      "FrequentItemsAggregator)")
  import FrequentItems.{mgMerge, mgTrim}

  override def zero: Map[String, Long] = Map.empty
  override def reduce(
      b: Map[String, Long], x: Map[String, Long]): Map[String, Long] =
    if (x == null) b else mgMerge(b, x, capacity)
  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    mgMerge(a, b, capacity)
  override def finish(r: Map[String, Long]): Map[String, Long] =
    mgTrim(r, capacity)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object FrequentItems {

  /** Largest sensible summary: past this the sketch's memory footprint
    * (~2x capacity counters per group per executor partition) stops
    * being the cheap side of the trade and an exact groupBy wins. */
  val MaxCapacity: Int = 1 << 20

  /** Subtract the (capacity+1)-th largest count from everything and drop
    * the non-positives — the mergeable-summaries trim. No-op while the
    * map fits. */
  private[functions] def mgTrim(
      m: Map[String, Long], capacity: Int): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      m.collect { case (k, c) if c > sub => k -> (c - sub) }
    }

  private[functions] def mgMerge(
      a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val (small, big) = if (a.size < b.size) (a, b) else (b, a)
    mgTrim(small.foldLeft(big) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }, capacity)
  }

  /** Untyped column form over a string column:
    * `df.agg(FrequentItems.freqItems(col("token"), 256).as("sketch"))`
    * yields one `map<string,bigint>` of at most `capacity` entries. */
  def freqItems(column: Column, capacity: Int): Column =
    org.apache.spark.sql.functions
      .udaf(new FrequentItemsAggregator(capacity), Encoders.STRING)
      .apply(column)

  /** Untyped column form of the summary rollup: aggregates a stored
    * `map<string,bigint>` sketch column into one merged summary. */
  def freqItemsMerge(column: Column, capacity: Int): Column =
    org.apache.spark.sql.functions
      .udaf(new FrequentItemsMergeAggregator(capacity),
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Map[String, Long]]())
      .apply(column)
}
