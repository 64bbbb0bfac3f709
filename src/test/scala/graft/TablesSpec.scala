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
