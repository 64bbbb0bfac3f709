package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate q19's cost — window() vs date_trunc vs scan. */
object Q19Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mat(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ev = Tables.load(spark, dir, "events")
    mat("scan only")(ev)
    mat("scan again")(ev)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
    mat("date_trunc agg")(
      ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("hour", "event_type"))
    mat("window() agg")(
      ev.groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("hour", "event_type"))
    mat("window() agg 2nd")(
      ev.groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("hour", "event_type"))
    spark.stop()
  }
}
