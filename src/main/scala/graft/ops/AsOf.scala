package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.time <= left.time` on the same key (SURVEY §2 Layer B
  * "Range / as-of" — "as-of = union + window").
  *
  * Scale design: the naive plan — equi-join on key with a `<=` time
  * predicate, then `row_number = 1` — materializes every
  * (left row × earlier right row) pair before discarding all but one:
  * O(|left| × |right|/key) intermediate rows, a fan-out blow-up at
  * 100 TB. Here both sides union into one frame, ONE shuffle partitions
  * by key, and a running `last_value(..., ignoreNulls)` carries the
  * latest right row forward — per-row state is a single struct, output
  * is exactly |left| rows, and no pair list ever exists.
  *
  * Semantics: ties at equal time are inclusive (the right row wins —
  * "at or before"); among right rows with identical time the LAST in
  * ascending `tieBreak` order wins (e.g. max id). Right rows with null
  * time never match, mirroring the SQL `time <= t` predicate. The whole
  * right payload rides in one struct so all emitted columns come from
  * the SAME matched row, never mixed across rows per-column.
  *
  * HOT-KEY BOUND: the default plan windows by key alone, so one
  * pathological key (a single user with 10⁹ events+orders) serializes
  * its whole timeline through one task — inherent to any ordered
  * per-key scan. `timeBucketSeconds` bounds that: rows are windowed by
  * `(key, time-bucket)` instead, with a per-bucket carry-in state (the
  * latest right row from all earlier buckets) computed over the tiny
  * per-(key, bucket) summary table and injected as a synthetic row at
  * each bucket's start. Task size becomes O(rows per key per bucket);
  * the extra cost is one summary window + one join, so leave it unset
  * unless key skew is real.
  */
object AsOf {

  /** @param payload  (right column → output alias) carried from the match
    * @param tieBreak right columns, ascending — last wins at equal time
    * @param direction "backward" (latest right row at-or-before, the
    *   default) or "forward" (earliest right row at-or-after) — forward
    *   is the same machinery with the time sort flipped, so the running
    *   last_value carries the nearest following row instead
    * @param timeBucketSeconds optional hot-key guard: window by
    *   (key, floor(time/width)) with cross-bucket carry-in instead of by
    *   key alone — identical results, bounded task size. Requires a
    *   numeric or timestamp time column. */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[(String, String)],
      tieBreak: Seq[String] = Nil,
      direction: String = "backward",
      timeBucketSeconds: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val internal = Set("_k", "_t", "_l", "_r", "_side", "_match",
      "_b", "_s", "_c", "_rn")
    val clash = left.columns.toSet.intersect(internal)
    require(clash.isEmpty,
      s"asof: left columns collide with internal names: ${clash.mkString(", ")}")
    val carried = (tieBreak ++ payload.map(_._1)).distinct
    // null-KEY right rows are dropped too: the window's partitionBy
    // groups nulls together, but the equi-join semantics this operator
    // replaces (`left.key = right.key AND right.time <= left.time`)
    // never match on null — a null-key left row keeps a null payload
    val rSel = right
      .filter(col(rightTime).isNotNull && col(rightKey).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTime).as("_t"),
        struct(carried.map(col): _*).as("_r"))
    val rType = rSel.schema("_r").dataType
    val lSel = left.select(
      struct(col("*")).as("_l"),
      col(leftKey).as("_k"), col(leftTime).as("_t"),
      lit(null).cast(rType).as("_r"))
    val lType = lSel.schema("_l").dataType
    val unioned =
      lSel.withColumn("_side", lit(1)).unionByName(
        rSel.select(
          lit(null).cast(lType).as("_l"), col("_k"), col("_t"), col("_r"))
          .withColumn("_side", lit(0)))
    // nulls FIRST in both directions: a null-time left row must precede
    // every right row so the running last() hands it a null payload —
    // plain .desc defaults to nulls LAST, which would hand a null-time
    // left row the earliest right row in forward mode
    val tOrd = if (direction == "backward") col("_t").asc_nulls_first
      else col("_t").desc_nulls_first
    val ord: Seq[Column] =
      tOrd +: col("_side").asc +: tieBreak.map(c => col("_r").getField(c).asc)
    def finalize(withMatch: DataFrame): DataFrame = withMatch
      .filter(col("_side") === 1)
      .select(
        col("_l.*") +:
          payload.map { case (c, alias) => col("_match").getField(c).as(alias) }: _*)
    timeBucketSeconds match {
      case None =>
        val w = Window.partitionBy("_k").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        finalize(unioned
          .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w)))

      case Some(width) =>
        require(width > 0, s"timeBucketSeconds must be positive, got $width")
        val tType = unioned.schema("_t").dataType
        require(tType.isInstanceOf[org.apache.spark.sql.types.NumericType]
            || tType == org.apache.spark.sql.types.TimestampType
            || tType == org.apache.spark.sql.types.TimestampNTZType,
          s"asof time-bucketing needs a numeric or timestamp time column, got $tType")
        // bucket index in SORT order: monotone coarsening of the time
        // sort, negated for forward so "earlier in sort" = lower bucket
        // either way. A null-time left row gets a null bucket — its
        // (key, null) partition holds no right rows and no carry-in, so
        // it keeps the null payload the unbucketed plan gives it.
        // NTZ has no direct long cast in Spark 4 — hop through
        // TimestampType (session-tz interpretation; monotone, which is
        // all a bucket index needs)
        val tLong =
          if (tType == org.apache.spark.sql.types.TimestampNTZType)
            col("_t").cast(org.apache.spark.sql.types.TimestampType).cast("long")
          else col("_t").cast("long")
        val bRaw = floor(tLong / lit(width.toDouble))
        val withB = unioned.withColumn("_b",
          if (direction == "backward") bRaw else -bRaw)
        // per-(key, bucket) final right state: the right row a later
        // bucket's running last() would be carrying at this bucket's end
        // (reverse the in-bucket sort, take row 1 — partition size is
        // bucket occupancy, never a whole key)
        val revOrd: Seq[Column] =
          (if (direction == "backward") col("_t").desc else col("_t").asc) +:
            tieBreak.map(c => col("_r").getField(c).desc)
        val bstate = withB.filter(col("_side") === 0)
          .withColumn("_rn", row_number().over(
            Window.partitionBy("_k", "_b").orderBy(revOrd: _*)))
          .filter(col("_rn") === 1)
          .select(col("_k"), col("_b"), col("_r").as("_s"))
        // carry-in per (key, bucket): the nearest earlier bucket's state.
        // This window IS per-key, but over one summary row per occupied
        // bucket — O(time range / width), not O(rows) — so the hot key
        // costs a few hundred tiny rows in one task, not its timeline.
        val cw = Window.partitionBy("_k").orderBy(col("_b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val synth = withB.filter(col("_b").isNotNull)
          .select("_k", "_b").distinct()
          .join(bstate, Seq("_k", "_b"), "left")
          .withColumn("_c", last(col("_s"), ignoreNulls = true).over(cw))
          .filter(col("_c").isNotNull)
          .select(
            lit(null).cast(lType).as("_l"),
            col("_k"),
            lit(null).cast(tType).as("_t"),
            col("_c").as("_r"),
            lit(-1).as("_side"), // sorts before both sides at its null time
            col("_b"))
        val w2 = Window.partitionBy("_k", "_b").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        finalize(withB.unionByName(synth)
          .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w2)))
    }
  }
}
