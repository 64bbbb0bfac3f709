package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. All
  * queries take the dir as a parameter so the same code runs at any SF
  * (and, on a real cluster, against any warehouse path).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`:
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses by
    * default. We read the nanos as long and truncate to microsecond
    * TimestampType here (sub-µs precision is below every operator's
    * granularity in the battery). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f =>
      f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // floor division, not `div` (which truncates toward zero and
        // would round PRE-epoch nanos to the wrong microsecond)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view so spark.sql queries can use the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
