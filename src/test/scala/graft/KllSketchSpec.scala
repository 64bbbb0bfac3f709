package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, KllSketch}

/** KLL quantile sketches: exact-mode equalities below capacity, the
  * persisted round-trip + merge read side, the rank-space error band
  * at scale, exact n, and the SQL surface. A KLL sketch never compacts
  * until its level-0 buffer overflows (~3k items at k=200), so
  * small-cardinality assertions are EQUALITIES against order
  * statistics — including through parquet and kll_merge_agg — while
  * large-n assertions are rank-space bands (the only contract KLL
  * makes; value-space error is structurally unbounded). */
class KllSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // inclusive quantile over distinct 1..n with uniform weight: the
  // smallest v whose fraction-<= reaches q, i.e. ceil(q*n) clamped to 1
  private def exactQ(n: Int, q: Double): Double =
    math.max(1, math.ceil(q * n).toInt).toDouble

  test("exact mode: quantiles and ranks are order-statistic equalities " +
    "below capacity, through parquet and kll_merge_agg") {
    val df = (1 to 100).map(v => (v % 4, v.toDouble)).toDF("g", "v")
      .repartition(4)
    val path = java.nio.file.Files
      .createTempDirectory("graft-kll-spec").toString + "/sk"
    df.groupBy("g").agg(KllSketch.kllSketch(col("v")).as("sk"))
      .write.mode("overwrite").parquet(path)
    val merged = spark.read.parquet(path)
      .agg(KllSketch.kllMerge(col("sk")).as("sk"))
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)) {
      val got = merged.select(KllSketch.kllQuantile(col("sk"), lit(q)))
        .head().getDouble(0)
      assert(got == exactQ(100, q), s"q=$q: got $got, want ${exactQ(100, q)}")
    }
    // ranks are exact too: fraction of {1..100} <= 37 is 0.37
    val r = merged.select(KllSketch.kllRank(col("sk"), lit(37.0)))
      .head().getDouble(0)
    assert(r == 0.37, s"exact-mode rank: $r")
    val n = merged.select(KllSketch.kllN(col("sk"))).head().getLong(0)
    assert(n == 100L, s"exact n through merge: $n")
  }

  test("n is EXACT at 100k rows and null/NaN values are skipped") {
    val vals = spark.range(100000).select(
      (col("id") % 1000).cast("double").as("v"))
    val withJunk = vals.unionByName(
      Seq(Option.empty[Double], Some(Double.NaN))
        .toDF("v"))
    val sk = withJunk.agg(KllSketch.kllSketch(col("v")).as("sk"))
    val n = sk.select(KllSketch.kllN(col("sk"))).head().getLong(0)
    assert(n == 100000L, s"null/NaN must not count: $n")
  }

  test("estimation mode: rank error at 100k values stays inside the " +
    "k=200 band, and the band survives repartitioning") {
    // uniform 0..99999: true rank of v is (v+1)/100000
    val big = spark.range(100000).select(col("id").cast("double").as("v"))
    for (parts <- Seq(1, 13)) {
      val sk = big.repartition(parts)
        .agg(KllSketch.kllSketch(col("v")).as("sk"))
      val probes = Seq(1000.0, 25000.0, 50000.0, 75000.0, 99000.0)
      val got = sk.select(
        probes.map(p => KllSketch.kllRank(col("sk"), lit(p))): _*)
        .head()
      probes.zipWithIndex.foreach { case (p, i) =>
        val trueRank = (p + 1) / 100000.0
        // DataSketches' published bound for k=200 is ~1.65% normalized
        // rank error at 99% confidence; 0.025 adds headroom so the
        // randomized compaction never flakes the suite
        assert(math.abs(got.getDouble(i) - trueRank) <= 0.025,
          s"parts=$parts probe=$p: rank ${got.getDouble(i)} vs $trueRank")
      }
    }
  }

  test("sketches built under DIFFERENT k merge and compare — the " +
    "documented contrast with the fixed-bin family's binning refusal") {
    GraftFunctions.register(spark)
    (1 to 50).map(_.toDouble).toDF("v").createOrReplaceTempView("kmix_lo")
    (51 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("kmix_hi")
    // build halves at k=128 and k=512, merge, read: n stays exact and
    // the merged quantiles are order statistics (both halves exact-mode)
    val row = spark.sql(
      """SELECT kll_n(m) AS n, kll_quantile(m, 0.5d) AS med,
        |  kll_ks(a, b) AS ks
        |FROM (
        |  SELECT kll_merge_agg(sk) AS m,
        |    min(CASE WHEN src = 'a' THEN sk END) AS a,
        |    min(CASE WHEN src = 'b' THEN sk END) AS b
        |  FROM (
        |    SELECT 'a' AS src, kll_sketch_agg(v, 128) AS sk FROM kmix_lo
        |    UNION ALL
        |    SELECT 'b' AS src, kll_sketch_agg(v, 512) AS sk FROM kmix_hi))
        |""".stripMargin).head()
    assert(row.getLong(0) == 100L && row.getDouble(1) == 50.0,
      s"mixed-k merge must stay exact below capacity: $row")
    // and the KS kernel compares across k too: disjoint halves separate
    assert(row.getDouble(2) >= 0.98, s"cross-k KS on disjoint halves: $row")
  }

  test("kll_ks / kll_ks_threshold: KS distance from stored bytes — " +
    "identical sketches score 0, disjoint ranges score 1, the " +
    "threshold-gated test separates same-distribution from shifted") {
    GraftFunctions.register(spark)
    val sks = Seq.tabulate(300)(i => (if (i < 100) "a" else if (i < 200) "b" else "c",
      if (i < 200) (i % 100 + 1).toDouble else (i % 100 + 201).toDouble))
      .toDF("g", "v")
      .groupBy("g").agg(KllSketch.kllSketch(col("v")).as("sk"))
    sks.createOrReplaceTempView("ks_sks")
    val row = spark.sql(
      """SELECT kll_ks(a.sk, a.sk) AS self, kll_ks(a.sk, b.sk) AS same,
        |  kll_ks(a.sk, c.sk) AS disjoint,
        |  kll_ks_threshold(a.sk, b.sk, 1e-6d) AS thr
        |FROM (SELECT sk FROM ks_sks WHERE g='a') a
        |CROSS JOIN (SELECT sk FROM ks_sks WHERE g='b') b
        |CROSS JOIN (SELECT sk FROM ks_sks WHERE g='c') c""".stripMargin)
      .head()
    // groups a and b hold the IDENTICAL values 1..100 (exact mode), so
    // both the self-delta and the cross-delta are exactly 0; group c is
    // 201..300, fully disjoint — the CDFs separate to (n−1)/n = 0.99
    // (the delta is evaluated at retained points with exclusive rank,
    // so the last point of `a` contributes F_a = 0.99 vs F_c = 0)
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0 &&
      row.getDouble(2) >= 0.98, s"deltas: $row")
    // the drift TEST: same distribution stays under the threshold,
    // the disjoint one exceeds it
    assert(row.getDouble(1) <= row.getDouble(3) &&
      1.0 > row.getDouble(3), s"threshold: $row")
    // tighter significance (smaller p) demands MORE evidence: the
    // threshold can only grow
    val mono = spark.sql(
      """SELECT kll_ks_threshold(a.sk, b.sk, 1e-9d) >=
        |       kll_ks_threshold(a.sk, b.sk, 0.1d)
        |FROM (SELECT sk FROM ks_sks WHERE g='a') a
        |CROSS JOIN (SELECT sk FROM ks_sks WHERE g='b') b""".stripMargin)
      .head().getBoolean(0)
    assert(mono, "threshold must be monotone decreasing in p")
    // empty side reads null; p outside (0, 1) refuses loudly
    val empty = spark.sql(
      """SELECT kll_ks(a.sk, e.sk) FROM (SELECT sk FROM ks_sks WHERE g='a') a
        |CROSS JOIN (SELECT kll_merge_agg(sk) AS sk FROM ks_sks
        |            WHERE false) e""".stripMargin).head()
    assert(empty.isNullAt(0), "empty sketch KS must be null")
    val oob = intercept[Exception] {
      spark.sql(
        """SELECT kll_ks_threshold(sk, sk, 2.0d) FROM ks_sks WHERE g='a'"""
      ).collect()
    }
    assert(oob.getMessage.contains("(0, 1)"), oob.getMessage)
  }

  test("SQL surface: kll_* kernels match the Column API in the exact " +
    "regime; k is validated; empty sketches read as null") {
    GraftFunctions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v")
      .createOrReplaceTempView("kll_rows")
    // SQL build + read: exact regime, so equality against order stats
    val row = spark.sql(
      """SELECT kll_quantile(sk, 0.5d) AS med, kll_rank(sk, 80.0d) AS r,
        |  kll_n(sk) AS n
        |FROM (SELECT kll_sketch_agg(v) AS sk FROM kll_rows)""".stripMargin)
      .head()
    assert(row.getDouble(0) == 50.0 && row.getDouble(1) == 0.8 &&
      row.getLong(2) == 100L, s"SQL surface: $row")
    // integer input casts through (the registry casts to double)
    val cast = spark.sql(
      """SELECT kll_quantile(kll_sketch_agg(id), 1.0d)
        |FROM range(10)""".stripMargin).head().getDouble(0)
    assert(cast == 9.0, s"int cast-through: $cast")
    // k must be an INTEGER literal inside its bounds
    val e = intercept[Exception] {
      spark.sql("SELECT kll_sketch_agg(v, CAST(rand() AS INT)) FROM kll_rows")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
    val bad = intercept[Exception] {
      spark.sql("SELECT kll_sketch_agg(v, 4) FROM kll_rows").collect()
    }
    assert(bad.getMessage.contains("[8, 65535]"))
    // merging zero sketches is the EMPTY sketch (representable, unlike
    // theta intersection), and its quantile/rank reads are null
    val empty = spark.sql(
      """SELECT kll_quantile(sk, 0.5d) AS a, kll_rank(sk, 1.0d) AS b,
        |  kll_n(sk) AS n
        |FROM (SELECT kll_merge_agg(sk) AS sk FROM
        |      (SELECT CAST(NULL AS BINARY) AS sk) WHERE sk IS NOT NULL)
        |""".stripMargin).head()
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.getLong(2) == 0L,
      s"empty sketch reads: $empty")
    // a rank outside [0, 1] refuses loudly
    val oob = intercept[Exception] {
      spark.sql(
        "SELECT kll_quantile(kll_sketch_agg(v), 1.5d) FROM kll_rows")
        .collect()
    }
    assert(oob.getMessage.contains("[0, 1]"), oob.getMessage)
  }

  test("kll_merge_agg without explicit k ADOPTS the inputs' k (no " +
    "silent accuracy downgrade merging high-k stored sketches); an " +
    "explicit k still governs and caps") {
    import graft.functions.KllKernel
    GraftFunctions.register(spark)
    // DataSketches merge takes the MIN k it touches, so a k=200 buffer
    // would permanently downgrade these k=512 group sketches (r16
    // advice). The adopted k must survive partial aggregation — the
    // repartition(8) forces partial buffers through serialize/
    // deserialize and the final combine's merge().
    val grouped = (1 to 1000).map(v => (v % 8, v.toDouble)).toDF("g", "v")
      .repartition(8)
      .groupBy("g").agg(KllSketch.kllSketch(col("v"), 512).as("sk"))
    grouped.createOrReplaceTempView("adapt_sks")
    val adaptive = spark.sql("SELECT kll_merge_agg(sk) FROM adapt_sks")
      .head().getAs[Array[Byte]](0)
    assert(KllKernel.wrap(adaptive).getK == 512,
      s"1-arg merge must adopt the inputs' k: ${KllKernel.wrap(adaptive).getK}")
    assert(KllKernel.n(adaptive) == 1000L)
    val scalaForm = grouped.agg(KllSketch.kllMerge(col("sk")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(KllKernel.wrap(scalaForm).getK == 512,
      "the Scala no-k overload matches the SQL 1-arg form")
    // explicit k: the caller asked for the downsize — deliberate
    val capped = spark.sql("SELECT kll_merge_agg(sk, 200) FROM adapt_sks")
      .head().getAs[Array[Byte]](0)
    assert(KllKernel.wrap(capped).getK == 200,
      s"explicit k governs: ${KllKernel.wrap(capped).getK}")
    assert(KllKernel.n(capped) == 1000L)
  }

  test("kll_retained: equals kll_n in exact mode, drops below n once " +
    "compacted — the premise guard q145/q148 gate their exact-parity " +
    "audits on") {
    GraftFunctions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("ret_small")
    spark.range(100000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("ret_big")
    val row = spark.sql(
      """SELECT
        |  (SELECT kll_retained(kll_sketch_agg(v)) FROM ret_small) AS sr,
        |  (SELECT kll_n(kll_sketch_agg(v)) FROM ret_small) AS sn,
        |  (SELECT kll_retained(kll_sketch_agg(v)) FROM ret_big) AS br,
        |  (SELECT kll_n(kll_sketch_agg(v)) FROM ret_big) AS bn
        |""".stripMargin).head()
    assert(row.getLong(0) == 100L && row.getLong(1) == 100L,
      s"exact mode: retained == n: $row")
    assert(row.getLong(3) == 100000L && row.getLong(2) < row.getLong(3),
      s"past capacity: retained < n (compaction happened): $row")
  }
}
