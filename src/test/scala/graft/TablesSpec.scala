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

  test("every loaded table exposes time columns as TimestampType, never NTZ or raw long") {
    for (t <- Tables.names) {
      val df = Tables.load(spark, sfDir, t)
      val offending = df.schema.fields.filter(f =>
        f.dataType == TimestampNTZType ||
          (f.name == "ts" && f.dataType == LongType))
      assert(offending.isEmpty,
        s"$t: un-normalized time columns ${offending.map(f => s"${f.name}:${f.dataType}").toSeq}")
    }
  }

  test("NTZ normalization preserves wall-clock values under the UTC session") {
    // the raw read (whatever Spark infers) and the normalized read must
    // format to identical wall-clock strings — the oracle compares
    // DuckDB's naive reading of the same file
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w"))
    val norm = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w"))
    assert(norm.schema("w").dataType == StringType)
    assertSameRows(raw.orderBy("event_id").limit(500), norm.orderBy("event_id").limit(500))
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
