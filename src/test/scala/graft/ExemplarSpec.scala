package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Exemplar, GraftFunctions}
import graft.ops.Profiling

/** Deterministic bottom-k-by-hash exemplar samples (family #6): the
  * sample is a PURE FUNCTION of the key set, so every assertion here
  * is an EQUALITY — against a window-rank twin, across partitioning
  * schedules, and through the merge identity — never a band. */
class ExemplarSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def docs = (1 to 500)
    .map(i => (i.toLong, s"text-$i", i % 7))
    .toDF("id", "text", "grp")

  test("exemplar_agg: per-group bottom-k equals the window-rank twin, " +
    "arrays ascend by hash, and k caps the size") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("ex_docs")
    val got = spark.sql(
      """SELECT grp, exemplar_agg(md5(CAST(id AS STRING)),
        |                         CAST(id AS STRING), 5) AS ex
        |FROM ex_docs GROUP BY grp""".stripMargin)
      .select(col("grp"), explode(col("ex")).as("e"))
      .select(col("grp"), col("e.h"), col("e.payload"))
    val twin = docs
      .select(col("grp"), md5(col("id").cast("string")).as("h"),
        col("id").cast("string").as("payload"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy("h", "payload")))
      .filter(col("rk") <= 5).drop("rk")
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty,
      "exemplar_agg must equal ORDER BY hash LIMIT k per group")
    // arrays come back ascending by h (the eval contract)
    val arr = spark.sql(
      """SELECT exemplar_agg(md5(CAST(id AS STRING)),
        |                    CAST(id AS STRING), 8) AS ex
        |FROM ex_docs""".stripMargin)
      .select(col("ex.h")).head().getSeq[String](0)
    assert(arr == arr.sorted && arr.size == 8, s"ascending, capped: $arr")
  }

  test("determinism under any partitioning: 1-partition and " +
    "32-partition runs produce the identical sample (partial " +
    "serialize/deserialize and merge schedules differ)") {
    val one = Profiling.exemplarSample(docs.coalesce(1), "id", 10)
      .collect().toSeq
    val many = Profiling.exemplarSample(docs.repartition(32), "id", 10)
      .collect().toSeq
    assert(one == many, s"sample must be schedule-independent:\n$one\n$many")
    // and the aggregate agrees with the composition
    val agg = docs.repartition(16)
      .agg(Exemplar.exemplarAgg(md5(col("id").cast("string")),
        to_json(struct(docs.columns.map(col).toIndexedSeq: _*)), 10).as("ex"))
      .select(explode(col("ex")).as("e"))
      .select(col("e.h"), col("e.payload")).collect().toSeq
    val comp = Profiling.exemplarSample(docs, "id", 10).collect().toSeq
    assert(agg == comp, "kernel and ORDER BY/LIMIT composition must agree")
  }

  test("merge identity: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ " +
    "bottomK(B)) — exactly, no error term (the rollup contract)") {
    val a = docs.filter(col("id") % 2 === 0)
    val b = docs.filter(col("id") % 2 === 1)
    val direct = Profiling.exemplarSample(docs, "id", 12).collect().toSeq
    val merged = Profiling.exemplarSample(a, "id", 12)
      .unionByName(Profiling.exemplarSample(b, "id", 12))
      .orderBy("h", "payload").limit(12).collect().toSeq
    assert(direct == merged, s"merge identity broke:\n$direct\n$merged")
  }

  test("payloads past the 64 KB writeUTF cap round-trip through " +
    "partial serialization intact") {
    val big = Seq((1L, "x" * 80000), (2L, "y" * 80000), (3L, "z"))
      .toDF("id", "text").repartition(3)
    val got = big.agg(Exemplar.exemplarAgg(
        md5(col("id").cast("string")), col("text"), 3).as("ex"))
      .select(explode(col("ex")).as("e")).select(col("e.payload"))
      .as[String].collect().toSet
    assert(got == Set("x" * 80000, "y" * 80000, "z"),
      s"long payloads must survive serialize/deserialize: sizes=" +
        got.map(_.length))
  }

  test("null hash or payload rows are skipped; k is validated; " +
    "non-string inputs refuse with a type error") {
    GraftFunctions.register(spark)
    Seq((Some("aa"), Some("p1")), (None, Some("p2")), (Some("bb"), None))
      .toDF("h", "p").createOrReplaceTempView("ex_nulls")
    val got = spark.sql("SELECT exemplar_agg(h, p, 5) AS ex FROM ex_nulls")
      .select(col("ex.payload")).head().getSeq[String](0)
    assert(got == Seq("p1"), s"nulls must be skipped: $got")
    val badK = intercept[Exception](
      spark.sql("SELECT exemplar_agg(h, p, 0) FROM ex_nulls").collect())
    assert(badK.getMessage.contains("[1, 100000]"), badK.getMessage)
    val badT = intercept[Exception](
      spark.sql("SELECT exemplar_agg(1, p, 5) FROM ex_nulls").collect())
    assert(badT.getMessage.toLowerCase.contains("string"), badT.getMessage)
  }

  test("kmv_estimate: the stored sample doubles as a distinct-count " +
    "estimator — inside the KMV rse band at k=256, EXACT when the " +
    "sample saw every key") {
    GraftFunctions.register(spark)
    spark.range(50000).createOrReplaceTempView("kmv_ids")
    val est = spark.sql(
      """SELECT kmv_estimate(
        |  exemplar_agg(md5(CAST(id AS STRING)), CAST(id AS STRING), 256),
        |  256) AS est
        |FROM kmv_ids""".stripMargin).head().getDouble(0)
    // rse ~ 1/sqrt(254) ~= 6.3%; 4-sigma band (the estimate is a fixed
    // number — md5 is deterministic — the band documents the accuracy
    // class, not run-to-run noise)
    assert(math.abs(est / 50000.0 - 1.0) < 0.25,
      s"KMV estimate off: $est vs 50000")
    // fewer distinct keys than k: the sample IS the key set — exact
    val exact = spark.sql(
      """SELECT kmv_estimate(
        |  exemplar_agg(md5(CAST(id AS STRING)), CAST(id AS STRING), 8), 8)
        |FROM kmv_ids WHERE id < 5""".stripMargin).head().getDouble(0)
    assert(exact == 5.0, s"below-k must be exact: $exact")
    // Scala API parity with the SQL surface
    val viaScala = spark.table("kmv_ids")
      .agg(Exemplar.exemplarAgg(md5(col("id").cast("string")),
        col("id").cast("string"), 256).as("ex"))
      .select(Exemplar.kmvEstimate(col("ex"), 256)).head().getDouble(0)
    assert(viaScala == est, s"Scala/SQL parity: $viaScala vs $est")
    intercept[IllegalArgumentException](
      Exemplar.kmvEstimate(col("x"), 1))
  }

  test("syncExemplarProfile + mergedExemplars: per-version stored rows " +
    "carry the exact n, sync is idempotent, and the merged read " +
    "equals the direct corpus sample — from stored rows only") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-exemplar-sync").toString
    val target = s"$root/tgt"
    val profile = s"$root/prof"
    val v1 = (1 to 60).map(i => (i.toLong, s"d$i")).toDF("id", "text")
    graft.sink.BucketedMergeSink.merge(
      spark, v1, target, "upsert", Seq("id"), numBuckets = 4)
    assert(Profiling.syncExemplarProfile(spark, target, profile, "id", 7)
      == Seq(1L))
    val v2 = (61 to 90).map(i => (i.toLong, s"d$i")).toDF("id", "text")
    graft.sink.BucketedMergeSink.merge(
      spark, v2, target, "upsert", Seq("id"), numBuckets = 4)
    assert(Profiling.syncExemplarProfile(spark, target, profile, "id", 7)
      == Seq(2L))
    // idempotent: everything retained is already profiled
    assert(Profiling.syncExemplarProfile(spark, target, profile, "id", 7)
      .isEmpty)
    val rows = spark.read.parquet(s"$profile/version=2")
      .select("h", "payload", "n").collect()
    assert(rows.length == 7 && rows.forall(_.getLong(2) == 90L),
      s"7 exemplars stamped with the snapshot's exact n: ${rows.toSeq}")
    // merged read from STORED rows == the direct sample of the final
    // snapshot (versions are cumulative upserts, so the distinct union
    // of per-version samples covers the same key set's bottom-k)
    val direct = Profiling.exemplarSample(
      graft.sink.BucketedMergeSink.readVersion(spark, target, 2L),
      "id", 7).collect().toSeq
    val merged = Profiling.mergedExemplars(spark, profile, 7)
      .collect().toSeq
    assert(merged == direct,
      s"stored-rollup exemplars must equal the direct sample:\n" +
        s"$merged\n$direct")
    // requesting a larger k than the samples were built with REFUSES:
    // truncated versions (stored < k AND stored < that version's n)
    // cannot reconstruct the corpus bottom-k — a silent biased result
    // would masquerade as the exact sample
    val bigK = intercept[IllegalArgumentException](
      Profiling.mergedExemplars(spark, profile, 20))
    assert(bigK.getMessage.contains("smaller k"), bigK.getMessage)
  }
}
