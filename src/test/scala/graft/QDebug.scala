package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one battery query by name against an sf dir, print
  * timing (and optionally the formatted plan). Test scope — not part of
  * the library. Usage:
  *   sbt "Test/runMain graft.QDebug q42_minhash_lsh /root/testdata/sf0.1 [explain]"
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    // the shipped session, same as Bench/Verify — a plan inspected here
    // is the plan the battery actually runs. SPARK_GRAFT_SHUFFLE pins
    // shuffle partitions for A/B runs against the derived default.
    val spark = GraftSession.create(
      shufflePartitions =
        sys.env.get("SPARK_GRAFT_SHUFFLE").map(_.toInt).getOrElse(0),
      configure = _
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    if (explain) df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[qdebug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
