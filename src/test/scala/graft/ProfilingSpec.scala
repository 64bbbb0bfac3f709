package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiling

/** Pins the fixed-bin histogram sketch contracts: bin edges (underflow
  * -1, overflow nbins, half-open [lo, hi)), NULLs uncounted, the
  * EXACT-merge law (rollup of shard sketches == direct histogram,
  * map-for-map, under any sharding), and the quantile read's
  * one-bin-width value bound. The battery replays exact-merge +
  * quantile bracketing on real data with a parquet round-trip (q133). */
class ProfilingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def histMapOf(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    df.select("hist").as[Map[Int, Long]].head()

  test("binOf: half-open equal-width bins with carried under/overflow") {
    val vals = Seq(-0.5, 0.0, 9.99, 10.0, 55.0, 99.99, 100.0, 340.0)
    val out = vals.toDF("v")
      .select(Profiling.binOf(col("v"), 0.0, 100.0, 10).as("b"))
      .as[Int].collect().toSeq
    assert(out == Seq(-1, 0, 0, 1, 5, 9, 10, 10))
  }

  test("exact-merge law: rollup of per-shard sketches equals the direct " +
    "histogram map-for-map, and NULLs are uncounted") {
    val df = Seq[(String, Integer, Int)](
      ("en", 5, 0), ("en", 15, 1), ("en", 15, 2), ("en", 95, 3),
      ("en", null.asInstanceOf[Integer], 0),
      ("de", 150, 0), ("de", -3, 1), ("de", 42, 2))
      .toDF("lang", "v", "shard")
    val perShard = Profiling.histSketch(df, "v", 0.0, 100.0, 10,
      Seq("lang", "shard"))
    val rolled = Profiling.histMerge(perShard, "hist", Seq("lang"))
    val direct = Profiling.histSketch(df, "v", 0.0, 100.0, 10, Seq("lang"))
    for (lang <- Seq("en", "de")) {
      val r = histMapOf(rolled.filter(col("lang") === lang))
      val d = histMapOf(direct.filter(col("lang") === lang))
      assert(r == d, s"$lang: rollup $r != direct $d")
    }
    assert(histMapOf(direct.filter(col("lang") === "en")) ==
      Map(0 -> 1L, 1 -> 2L, 9 -> 1L), "null must not be counted")
    assert(histMapOf(direct.filter(col("lang") === "de")) ==
      Map(-1 -> 1L, 4 -> 1L, 10 -> 1L), "under/overflow bins carried")
  }

  test("histQuantile: left bin edge within one bin width of the true " +
    "rank element; overflow reports the range bound") {
    // 10 values in [0,100), bins of width 10
    val m = typedLit(Map(0 -> 2L, 3 -> 5L, 7 -> 2L, 10 -> 1L))
    val got = spark.range(1)
      .select(
        Profiling.histQuantile(m, 0.0, 100.0, 10, 0.2).as("q20"),
        Profiling.histQuantile(m, 0.0, 100.0, 10, 0.5).as("q50"),
        Profiling.histQuantile(m, 0.0, 100.0, 10, 0.9).as("q90"),
        Profiling.histQuantile(m, 0.0, 100.0, 10, 1.0).as("q100"))
      .as[(Double, Double, Double, Double)].head()
    // ranks: ceil(10*.2)=2 -> bin 0; ceil(10*.5)=5 -> bin 3;
    // ceil(10*.9)=9 -> bin 7; rank 10 -> overflow bin -> hi
    assert(got == ((0.0, 30.0, 70.0, 100.0)))
  }

  test("histPsi: zero for identical shapes, analytic value for a known " +
    "shift, symmetric-ish large for disjoint supports") {
    val a = typedLit(Map(0 -> 50L, 1 -> 50L))
    val a2 = typedLit(Map(0 -> 5L, 1 -> 5L)) // same SHAPE, different n
    val b = typedLit(Map(0 -> 25L, 1 -> 75L))
    val c = typedLit(Map(2 -> 10L, 3 -> 10L))
    val (same, shifted, disjoint) = spark.range(1)
      .select(Profiling.histPsi(a, a2).as("s"),
        Profiling.histPsi(a, b).as("m"),
        Profiling.histPsi(a, c).as("d"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(same) < 1e-12, s"identical shapes must score 0, got $same")
    // analytic: (0.5-0.25)ln(2) + (0.5-0.75)ln(2/3) = 0.25ln2 + 0.25ln(3/2)
    val expected = 0.25 * math.log(2.0) + 0.25 * math.log(1.5)
    assert(math.abs(shifted - expected) < 1e-9, s"got $shifted want $expected")
    assert(disjoint > 10.0, s"disjoint supports must blow past any " +
      s"stability threshold, got $disjoint")
  }
}
