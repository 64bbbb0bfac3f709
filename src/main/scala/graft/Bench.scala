package graft

import scala.jdk.CollectionConverters._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Bench the SHIPPED session: GraftSession.create (AQE + skew-join +
    // UTC + GraftExtensions kernels + shuffle partitions derived from
    // the live parallelism) — a hand-built session here would measure a
    // config no library user actually gets.
    val spark = GraftSession.create(configure = _
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: first jobs in a fresh JVM pay classloading, codegen
    // compiler init and parquet footer reads; without this the first
    // benched query absorbs ~5 s that has nothing to do with its plan.
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try {
        Tables.load(spark, sfDir, t).groupBy().count()
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    // Optional comma-separated query-name filter for local iteration
    // (unset = full battery; the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        // settle between queries so one query's garbage isn't collected
        // on the next query's clock — the main shared-JVM interference
        // that made cross-round per-query deltas unattributable
        System.gc()
        Thread.sleep(25)
        val t0 = System.nanoTime()
        // noop write: computes and consumes every output column (a count()
        // would let Catalyst prune projections/sorts and under-measure the
        // scalar-function queries)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          // visible sentinel: a swallowed failure must not masquerade as
          // the fastest query in the report
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
        }
      }
    // best-of-2: identical plans vary up to ~2x run-to-run on a shared
    // box; the per-query minimum is the standard noise-resistant estimate.
    // A -1 failure sentinel only survives when EVERY pass failed — a
    // transient failure must not override a valid timing (min(-1, t)
    // would report the query as failed AND shrink the total).
    val runs = Seq(onePass(), onePass())
    val names = runs.head.map(_._1)
    val byName = runs.map(_.toMap)
    val results = names.map { name =>
      val ts = byName.map(_.apply(name)).filter(_ >= 0)
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // both raw pass times per query: the min hides variance; the pair
    // makes a cross-round delta attributable (a real change moves BOTH
    // passes; JVM noise moves one)
    val passes = names.map { name =>
      s"\"" + name + "\":[" + byName.map(_.apply(name)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum // -1 = failed sentinel
    // JVM + session identity: without it, a heap/GC/partition-count
    // difference between rounds reads as a query regression
    val rt = Runtime.getRuntime
    val gcNames = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getName).mkString("+")
    val jvm = s"""{"heap_max_mb":${rt.maxMemory() / 1048576},""" +
      s""""gc":"$gcNames","cpus":"$cpus",""" +
      s""""shuffle_partitions":"${spark.conf.get("spark.sql.shuffle.partitions")}",""" +
      s""""n_queries":${results.size}}"""
    // Testdata fingerprint (per-table "bytes:mtime"): the driver
    // regenerates /root/testdata between rounds, so without a data
    // identity in the report, cross-round per-query comparisons are
    // unattributable (a slower query may just be a bigger corpus).
    val fp = Tables.names
      .map { t =>
        val f = new java.io.File(s"$sfDir/$t.parquet")
        // listFiles() is the nullable call (null on I/O error), not the
        // File constructor
        val files = (if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq
          else Seq(f)).filter(_.isFile)
        val bytes = files.map(_.length).sum
        val mtime = if (files.isEmpty) 0L else files.map(_.lastModified).max
        s"\"$t\":\"$bytes:$mtime\""
      }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"sf":"$sfDir","runs":2,"agg":"min","jvm":$jvm,"data":$fp}""")
    spark.stop()
  }
}
