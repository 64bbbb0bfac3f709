package graft

import org.apache.spark.sql.SparkSession

/** Pre-configured session builder: the Spark settings this library's
  * scale design assumes, plus the native-kernel SQL functions injected
  * ([[graft.functions.GraftExtensions]]). A host application can start
  * from `GraftSession.builder(...)` instead of remembering the knobs.
  *
  * Why each knob (see docs/SCALE.md for the operator-level story):
  *   - AQE on: runtime broadcast decisions for candidate rehydration
  *     joins (the candidate-id union is unbounded, so plans place no
  *     broadcast hints) and post-shuffle coalescing where operators
  *     haven't pinned an exchange.
  *   - AQE skew join on: the contamination/TF-IDF/salted-join designs
  *     route hot keys through joins PRECISELY because joins are
  *     skew-splittable (windows are not).
  *   - shuffle partitions: size to ~2-3× total executor cores; at
  *     100 TB also bounded below by (shuffled bytes / target partition
  *     size ~128-200 MB) so partitions fit executor memory.
  *   - UTC session timezone: timestamp determinism across engines —
  *     every oracle comparison in the battery assumes it.
  */
object GraftSession {

  def builder(shufflePartitions: Int = 200): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
}
