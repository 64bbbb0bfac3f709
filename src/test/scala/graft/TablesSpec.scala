package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.load`'s timestamp-normalization contract: whatever
  * encoding the testdata generator writes for time columns, every
  * battery query sees session-tz TimestampType with unchanged
  * wall-clock values. The generator has already switched encodings
  * once (TIMESTAMP(NANOS)-as-long → TIMESTAMP(µs) NTZ-inferred);
  * this spec is what fails loudly — and locally — if it happens again
  * in a form `load` doesn't cover. */
class TablesSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveTestdata = new java.io.File(sfDir).isDirectory

  test("canary: every table's normalized schema carries session-tz " +
    "TimestampType time columns — nowhere NTZ or raw long, not even nested") {
    assume(haveTestdata, s"driver testdata absent at $sfDir — regenerated per round")
    // Positive enumeration: the time columns the battery depends on must
    // come out of Tables.load as exactly TimestampType, whatever encoding
    // this round's regenerated testdata uses (NANOS-as-long in r≤9, NTZ
    // in r10+). A future encoding `load` doesn't cover fails HERE with
    // the table and column named, instead of as 40 cryptic battery reds.
    val expectedTime = Map(
      "events" -> Seq("ts"),
      "lineitem" -> Seq("l_shipdate"),
      "orders" -> Seq("o_orderdate"))
    for (t <- Tables.names) {
      val df = Tables.load(spark, sfDir, t)
      for (c <- expectedTime.getOrElse(t, Nil))
        assert(df.schema(c).dataType == TimestampType,
          s"$t.$c: expected session-tz TimestampType, got ${df.schema(c).dataType}")
      // and NO field anywhere in the tree may remain NTZ or a raw time-long
      def ntzInside(dt: DataType): Boolean = dt match {
        case TimestampNTZType => true
        case s: StructType => s.fields.exists(f => ntzInside(f.dataType))
        case a: ArrayType => ntzInside(a.elementType)
        case m: MapType => ntzInside(m.keyType) || ntzInside(m.valueType)
        case _ => false
      }
      val offending = df.schema.fields.filter(f =>
        ntzInside(f.dataType) ||
          (expectedTime.getOrElse(t, Nil).contains(f.name) && f.dataType == LongType))
      assert(offending.isEmpty,
        s"$t: un-normalized time columns ${offending.map(f => s"${f.name}:${f.dataType}").toSeq}")
    }
  }

  test("NTZ normalization preserves wall-clock values under the UTC session") {
    assume(haveTestdata, s"driver testdata absent at $sfDir — regenerated per round")
    // The raw read (whatever Spark infers) and the normalized read must
    // format to identical wall-clock strings — the oracle compares
    // DuckDB's naive reading of the same file. Only meaningful when the
    // raw encoding IS a timestamp: under a long-encoded regeneration the
    // raw date_format is ill-typed and the dtype canary above is the
    // failure that names the problem.
    val raw0 = spark.read.parquet(s"$sfDir/events.parquet")
    val rawType = raw0.schema("ts").dataType
    assume(rawType == TimestampNTZType || rawType == TimestampType,
      s"raw events.ts is $rawType — wall-clock equivalence undefined; dtype canary covers this")
    val raw = raw0
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w"))
    val norm = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w"))
    assert(norm.schema("w").dataType == StringType)
    // full-table comparison (assertSameRows canonicalizes order): a
    // limit-after-orderBy on a possibly non-unique key could select
    // different row sets from the two frames and flake
    assertSameRows(raw, norm)
  }

  test("load caches the analyzed plan per (session, dir, table); a " +
    "different session gets its own entry with identical rows") {
    assume(haveTestdata, s"driver testdata absent at $sfDir — regenerated per round")
    val a = Tables.load(spark, sfDir, "region")
    val b = Tables.load(spark, sfDir, "region")
    // reference equality IS the contract: the second load pays zero
    // driver-side file-listing/schema-inference work
    assert(a eq b, "repeat load in one session must return the cached plan")
    val s2 = spark.newSession()
    val c = Tables.load(s2, sfDir, "region")
    assert(c ne a, "a distinct session must re-infer (fresh conf, fresh catalog)")
    assertSameRows(a.orderBy("r_regionkey"), c.orderBy("r_regionkey"))
  }

  test("loadCache is bounded: session churn past the cap evicts other " +
    "sessions' plans instead of leaking them for the process lifetime") {
    assume(haveTestdata, s"driver testdata absent at $sfDir — regenerated per round")
    // each churned session caches one entry; without eviction the map
    // would end at >= 2*cap entries, each strongly pinning its session
    (1 to 2 * Tables.loadCacheCap).foreach { _ =>
      Tables.load(spark.newSession(), sfDir, "region")
    }
    assert(Tables.loadCacheSize <= Tables.loadCacheCap + 1,
      s"cache grew to ${Tables.loadCacheSize} entries past the " +
        s"${Tables.loadCacheCap} cap — stopped sessions leak")
    // and the surviving session still serves correct rows
    val again = Tables.load(spark, sfDir, "region")
    assert(again.count() > 0)
  }

  test("loadCache bounds a SINGLE session too, and entry-level LRU " +
    "keeps a concurrently-live session's hot plans (r15 advice)") {
    assume(haveTestdata, s"driver testdata absent at $sfDir — regenerated per round")
    // symlinked dirs give one session arbitrarily many distinct (dir,
    // name) keys over the same physical parquet — the shape the old
    // wipe-foreign-sessions policy never bounded at all
    val root = java.nio.file.Files.createTempDirectory("graft-lru-spec")
    val src = java.nio.file.Paths.get(s"$sfDir/region.parquet")
    val one = spark.newSession()
    val hot = Tables.load(one, sfDir, "region") // the entry LRU must keep
    (1 to Tables.loadCacheCap + 16).foreach { i =>
      val d = root.resolve(s"d$i")
      java.nio.file.Files.createDirectory(d)
      java.nio.file.Files.createSymbolicLink(
        d.resolve("region.parquet"), src)
      Tables.load(one, d.toString, "region")
      // touch the hot entry so LRU ranks it above the churned ones
      if (i % 64 == 0) Tables.load(one, sfDir, "region")
    }
    assert(Tables.loadCacheSize <= Tables.loadCacheCap,
      s"one session grew the cache to ${Tables.loadCacheSize} past the " +
        s"${Tables.loadCacheCap} cap — the within-session bound is gone")
    // the periodically-touched entry survived the churn (entry-level
    // LRU), so the hot path still pays zero re-inference
    assert(Tables.load(one, sfDir, "region") eq hot,
      "recently-used entry was evicted by same-session churn — eviction " +
        "is not LRU")
  }

  test("crash-orphan sweep: a dead pid's scratch dirs are reclaimed, a " +
    "live pid's and non-graft names are never touched (r15 verdict #4)") {
    // a SIGKILL/OOM-kill skips the shutdown hook, stranding RAM-backed
    // /dev/shm scratch until reboot; startup pruning is the reclaim path
    val root = java.nio.file.Files.createTempDirectory("graft-sweep-spec").toFile
    def mk(name: String): java.io.File = {
      val d = new java.io.File(root, name)
      d.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(d, "part-0").toPath, Array[Byte](1, 2, 3))
      d
    }
    val self = ProcessHandle.current().pid()
    // 2^22 is the kernel's PID_MAX_LIMIT; beyond it no live pid exists
    val dead = mk(s"graft-apxmemoabc-${(1L << 22) + 7}-deadbeef")
    val live = mk(s"graft-fix-$self-cafe")
    val other = mk("unrelated-dir")
    val noMatch = mk("graft-fix-notapid-cafe") // name shape outside the pattern
    Tables.sweepScratch(Seq(root),
      pid => pid == self || Tables.pidAlive(pid))
    assert(!dead.exists, "dead-pid scratch survived the sweep")
    assert(live.exists, "live (self) scratch was swept")
    assert(other.exists, "non-graft dir was touched")
    assert(noMatch.exists, "non-matching name was touched")
  }

  test("launchScratchPath: strong key hash (no 32-bit collisions) and a " +
    "per-launch nonce on top of the pid (r15 advice)") {
    // "Aa" and "BB" collide in String.hashCode — the old scratchPath key
    val a = Tables.launchScratchPath("graft-apxmemo", "Aa")
    val b = Tables.launchScratchPath("graft-apxmemo", "BB")
    assert("Aa".hashCode == "BB".hashCode, "test premise: 32-bit collision")
    assert(a != b, "colliding 32-bit keys must map to distinct memo dirs")
    // nonce present: the name is not a function of the pid alone, so a
    // recycled pid after a SIGKILL cannot resurrect a dead launch's memo
    assert(a.contains(Tables.launchNonce))
    assert(a.contains(s"-${ProcessHandle.current().pid()}-"))
    // and the name still matches the sweep's reclaim pattern
    val base = new java.io.File(a).getName
    assert(base.matches("""graft-[A-Za-z0-9]+-\d+-[0-9a-fA-F]+"""),
      s"memo dir $base escapes the crash-orphan sweep pattern")
  }

  test("as-of time-bucketing accepts TimestampNTZType and matches the unbucketed result") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-02 00:00:00")).toDF("k", "t")
      .withColumn("t", col("t").cast(TimestampNTZType))
    val right = Seq((1L, "2024-01-01 09:00:00", 10.0), (1L, "2024-01-02 09:00:00", 20.0),
      (2L, "2024-01-01 00:00:00", 30.0)).toDF("k", "t", "v")
      .withColumn("t", col("t").cast(TimestampNTZType))
    def run(bucket: Option[Long]) = graft.ops.AsOf.asof(
      left, right, leftKey = "k", leftTime = "t",
      rightKey = "k", rightTime = "t",
      payload = Seq("v" -> "last_v"), timeBucketSeconds = bucket)
      .select("k", "t", "last_v")
    assertSameRows(run(None).orderBy("k", "t"), run(Some(86400L)).orderBy("k", "t"))
    assert(canon(run(Some(86400L))).map(_.last) == Seq("10.0", "20.0", "30.0"))
  }
}
