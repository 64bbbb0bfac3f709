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

  /** Normalize `events.ts` to TimestampType whatever the generator
    * wrote — the battery's queries and oracles are built against
    * session-tz (UTC-pinned) timestamps:
    *   - parquet TIMESTAMP(NANOS): Spark refuses it by default; sessions
    *     set `spark.sql.legacy.parquet.nanosAsLong=true`, we read the
    *     nanos as long and truncate to microseconds (sub-µs precision is
    *     below every operator's granularity in the battery).
    *   - parquet TIMESTAMP(µs, isAdjustedToUTC=false): Spark 4 infers
    *     TIMESTAMP_NTZ; with the session tz pinned to UTC the cast to
    *     TimestampType is the identity on wall-clock values, which is
    *     exactly what DuckDB reads for the oracle. */
  /** Per-session plan cache: `spark.read.parquet` pays a driver-side
    * file-listing/schema-inference job per call, and the battery loads
    * the same immutable testdata tables hundreds of times per run
    * (every entry, every bench pass). The cached value is just the
    * analyzed plan — lazy, no data pinned — keyed on session so a
    * fresh session (new JVM, new bench family) re-infers. Testdata is
    * read-only by contract, so staleness cannot arise. */
  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]

  // eviction bound: cached DataFrames strongly reference their
  // SparkSession, so without one a long-lived host JVM that creates
  // many sessions (test suites, repeated bench families, embedders)
  // would leak every stopped session's state for the process lifetime.
  // Generous enough that the battery's handful of live sessions never
  // thrash; past it, every OTHER session's entries drop (re-inference
  // is the only cost) while the requesting session keeps its plans.
  private[graft] val loadCacheCap = 256

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // sessionUuid, not identityHashCode: identity hashes can collide
    // across sessions after GC churn, and a collision would hand one
    // session a DataFrame bound to another's state
    val sid = org.apache.spark.sql.GraftSqlBridge.sessionUuid(spark)
    val df = loadCache.computeIfAbsent(
      (sid, dir, name), _ => loadUncached(spark, dir, name))
    if (loadCache.size > loadCacheCap)
      loadCache.keySet.removeIf(k => k._1 != sid)
    df
  }

  // spec hook: TablesSpec pins that session churn cannot grow the cache
  private[graft] def loadCacheSize: Int = loadCache.size

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val nanosFixed = df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // floor division, not `div` (which truncates toward zero and
        // would round PRE-epoch nanos to the wrong microsecond)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => df
    }
    graft.sources.Sources.normalizeNtz(nanosFixed)
  }

  /** Register every table as a temp view so spark.sql queries can use the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Scratch path for a CACHED fixture derived from `src` (a testdata file
    * or directory). Keyed on the source's full file listing — names,
    * sizes, mtimes; Spark part-file names carry writer UUIDs, so any
    * regeneration moves the key even on filesystems with coarse mtimes
    * where (length ^ mtime) alone could collide — and on this JVM's
    * pid, so concurrent batteries sharing /tmp (e.g. a Verify and a
    * Bench in separate processes) can never race on a half-written
    * fixture. Within one process the fixture still builds once and is
    * reused across passes. */
  /** Every fixture/scratch dir is pid-scoped (see below), so nothing
    * cleans one process's dirs while another reads them — but that also
    * means every fresh JVM (a bench run spawns up to ~9) builds fixtures
    * under NEW /tmp paths, and without cleanup /tmp grows without bound
    * across rounds. Two-sided fix, installed once per JVM on first
    * fixture/scratch use:
    *   - a shutdown hook deletes THIS pid's `graft-*` dirs on clean exit;
    *   - startup pruning deletes `graft-*` dirs whose embedded pid is no
    *     longer alive (kill -9 and OOM-kills skip shutdown hooks).
    * Live processes' dirs are never touched. */
  private val dirName = """^graft-[A-Za-z0-9]+-(\d+)-[0-9a-fA-F]+$""".r

  /** Harness scratch lives on tmpfs when the host has one — the same
    * opt-in the bench makes for Spark's local dirs (Bench scaladoc:
    * take the sandbox's ext4-discard/fsync stalls out of the
    * measurement). These dirs hold only battery-harness artifacts
    * (merge targets, outboxes, stream checkpoints — MBs); the LIBRARY
    * default for user data stays wherever the user points it, so no
    * application inherits RAM-backed storage silently. */
  private lazy val scratchRoot: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"

  private lazy val cleanupInstalled: Unit = {
    val self = ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    def sweep(keep: Long => Boolean): Unit =
      Seq("/tmp", "/dev/shm").distinct
        .flatMap(r => Option(new java.io.File(r).listFiles())
          .getOrElse(Array.empty).toSeq)
        .foreach { f =>
          f.getName match {
            case dirName(pid) if !keep(pid.toLong) =>
              try rm(f) catch { case _: Throwable => () }
            case _ => ()
          }
        }
    def alive(pid: Long): Boolean = {
      val oh = ProcessHandle.of(pid)
      oh.isPresent && oh.get.isAlive
    }
    sweep(pid => pid == self || alive(pid))
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      sweep(pid => pid != self)))
  }

  def fixturePath(prefix: String, src: String): String = {
    cleanupInstalled
    val f = new java.io.File(src)
    val files =
      (if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq
       else Seq(f)).filter(_.isFile)
        .map(x => s"${x.getName}:${x.length}:${x.lastModified}").sorted
    val h = scala.util.hashing.MurmurHash3.orderedHash(files :+ src)
    s"$scratchRoot/$prefix-${ProcessHandle.current().pid()}-${Integer.toHexString(h)}"
  }

  /** Scratch path for a REBUILT-per-invocation target (callers
    * deleteQuietly it up front): pid-scoped so concurrent processes
    * cannot delete each other's target mid-read. tmpfs-backed when the
    * host has /dev/shm (see [[scratchRoot]]). */
  def scratchPath(prefix: String, dir: String): String = {
    cleanupInstalled
    s"$scratchRoot/$prefix-${ProcessHandle.current().pid()}-${Integer.toHexString(dir.hashCode)}"
  }
}
