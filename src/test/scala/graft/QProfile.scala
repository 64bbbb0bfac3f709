package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dev tool: phase-by-phase timing of the near-dup operators at a given
  * sf dir. Materializes each stage with a noop write. */
object QProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    val docs = Tables.load(spark, dir, "documents")
    // warm up the scan + codegen path
    mat("warmup scan")(docs.select(length(col("text")).as("l")))

    val norm = docs.select(col("doc_id").as("id"),
      Dedup.normalize(col("text")).as("t"))
    mat("normalize only")(norm)
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(Dedup.normalize(col("text")), 3).as("sh"))
    mat("shingles")(sh)
    val sized = sh.withColumn("setsize", size(col("sh")))
    val posts = sized.select(col("id"), col("setsize"),
      explode(col("sh")).as("shingle"))
    mat("posts explode")(posts)
    val grouped = posts.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("setsize"))).as("docs"))
      .filter(size(col("docs")).between(2, 10000))
    mat("grouped posting lists")(grouped)
    val pairs = grouped
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.setsize").as("size_a"), col("b.setsize").as("size_b"))
      .agg(count(lit(1)).as("inter"))
    mat("pair agg")(pairs)
    mat("q41 full")(Dedup.jaccardPairs(docs, threshold = 0.3))

    val hashed = sh.select(col("id"), Dedup.hashShingles(col("sh")).as("hashed"))
    mat("hashShingles")(hashed)
    mat("minhash sig")(hashed.select(col("id"),
      Dedup.minhashSignature(col("hashed"), 32).as("sig")))
    mat("q42 full")(Dedup.minhashLshPairs(docs, threshold = 0.3))

    mat("simhash only")(docs.select(col("doc_id"),
      Dedup.simhash(Dedup.normalize(col("text"))).as("h")))
    mat("q43 full")(Dedup.simhashPairs(docs, maxHamming = 3))
    spark.stop()
  }
}
