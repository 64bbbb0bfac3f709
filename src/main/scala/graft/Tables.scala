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
  // eviction bound: cached DataFrames strongly reference their
  // SparkSession, so without one a long-lived host JVM that creates
  // many sessions (test suites, repeated bench families, embedders)
  // would leak every stopped session's state for the process lifetime.
  // Generous enough that the battery's handful of live sessions never
  // thrash. Eviction is entry-level LRU (r15 advice): past the cap the
  // least-recently-used entry drops, whatever session owns it — the
  // old wipe-every-foreign-session policy let two live sessions that
  // jointly exceeded the cap thrash each other to a ~0% hit rate, and
  // never bounded a SINGLE session's growth at all. Re-inference is
  // the only cost of a miss.
  private[graft] val loadCacheCap = 256

  private val loadCache =
    new java.util.LinkedHashMap[(String, String, String), DataFrame](
      64, 0.75f, /* accessOrder = LRU */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), DataFrame]): Boolean =
        size() > loadCacheCap
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // sessionUuid, not identityHashCode: identity hashes can collide
    // across sessions after GC churn, and a collision would hand one
    // session a DataFrame bound to another's state
    val sid = org.apache.spark.sql.GraftSqlBridge.sessionUuid(spark)
    val key = (sid, dir, name)
    val hit = loadCache.synchronized(Option(loadCache.get(key)))
    hit.getOrElse {
      // load OUTSIDE the monitor (Spark driver work); on a lost race
      // keep the winner so repeat loads stay reference-equal
      val df = loadUncached(spark, dir, name)
      loadCache.synchronized {
        Option(loadCache.get(key)).getOrElse { loadCache.put(key, df); df }
      }
    }
  }

  // spec hook: TablesSpec pins that session churn cannot grow the cache
  private[graft] def loadCacheSize: Int =
    loadCache.synchronized(loadCache.size)

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

  private[graft] def pidAlive(pid: Long): Boolean = {
    val oh = ProcessHandle.of(pid)
    oh.isPresent && oh.get.isAlive
  }

  /** Delete every `graft-*-<pid>-*` scratch dir under `roots` whose
    * embedded pid fails `keep`. Non-matching names are never touched.
    * Exposed for TablesSpec's crash-orphan pin (r15 verdict #4):
    * startup pruning is what reclaims a SIGKILL'd process's
    * RAM-backed /dev/shm garbage, so its behavior is spec-pinned, not
    * just exercised implicitly. */
  private[graft] def sweepScratch(
      roots: Seq[java.io.File], keep: Long => Boolean): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    roots
      .flatMap(r => Option(r.listFiles()).getOrElse(Array.empty).toSeq)
      .foreach { f =>
        f.getName match {
          case dirName(pid) if !keep(pid.toLong) =>
            try rm(f) catch { case _: Throwable => () }
          case _ => ()
        }
      }
  }

  private lazy val cleanupInstalled: Unit = {
    val self = ProcessHandle.current().pid()
    val roots = Seq("/tmp", "/dev/shm").distinct.map(new java.io.File(_))
    sweepScratch(roots, pid => pid == self || pidAlive(pid))
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      sweepScratch(roots, pid => pid != self)))
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

  /** Alphanumeric token unique to this JVM LAUNCH: pid plus the
    * process start instant. A pid alone can recycle — a SIGKILL'd JVM
    * skips its shutdown sweep, and if the startup prune hasn't run
    * yet (or raced), a recycled pid would resurrect the dead launch's
    * scratch. Two launches can share a pid only across a reuse, and
    * then their start instants differ. */
  private[graft] lazy val launchNonce: String = {
    val info = ProcessHandle.current().info()
    val startMs: Long =
      if (info.startInstant().isPresent) info.startInstant().get.toEpochMilli
      else System.nanoTime() // fallback: still fixed for the JVM's life
    java.lang.Long.toHexString(startMs)
  }

  /** Scratch path for a LAUNCH-LOCAL memo (r15 advice): like
    * [[scratchPath]] but (a) the name carries [[launchNonce]] on top
    * of the pid, so a recycled pid after a SIGKILL can never read the
    * dead launch's artifacts, and (b) the key rides as a strong
    * 64-bit content hash (SHA-256 prefix) instead of the 32-bit
    * `String.hashCode`, so distinct keys cannot collide onto one dir.
    * The name still matches the sweep pattern (prefix+nonce is one
    * alphanumeric run; the pid stays the swept capture group). */
  def launchScratchPath(prefix: String, key: String): String = {
    cleanupInstalled
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8"))
    val h = digest.take(8).map(b => f"$b%02x").mkString
    s"$scratchRoot/$prefix$launchNonce-${ProcessHandle.current().pid()}-$h"
  }
}
