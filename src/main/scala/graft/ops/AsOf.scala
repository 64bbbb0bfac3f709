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
  */
object AsOf {

  /** @param payload  (right column → output alias) carried from the match
    * @param tieBreak right columns, ascending — last wins at equal time
    * @param direction "backward" (latest right row at-or-before, the
    *   default) or "forward" (earliest right row at-or-after) — forward
    *   is the same machinery with the time sort flipped, so the running
    *   last_value carries the nearest following row instead */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[(String, String)],
      tieBreak: Seq[String] = Nil,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val internal = Set("_k", "_t", "_l", "_r", "_side", "_match")
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
    val w = Window.partitionBy("_k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        col("_l.*") +:
          payload.map { case (c, alias) => col("_match").getField(c).as(alias) }: _*)
  }
}
