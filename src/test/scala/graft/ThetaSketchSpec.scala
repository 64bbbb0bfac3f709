package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, ThetaSketch}

/** Theta set-algebra sketches: exact-mode determinism, the persisted
  * round-trip read side, estimation-mode error bands, and the SQL
  * surface. A theta sketch is EXACT until its retained-hash count
  * exceeds the nominal 2^lgK, so small-cardinality assertions are
  * equality, not bands — including through union/intersection/
  * difference, which are exact over exact inputs. */
class ThetaSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("exact mode: estimate, union, intersection, and difference are " +
    "equalities below 2^lgK; stored bytes survive parquet") {
    // A = {0..999}, B = {500..1499}: |A|=|B|=1000, |A∪B|=1500,
    // |A∩B|=500, |A\B|=500 — all far under 2^12
    val rows = (0 until 1000).map(i => ("a", s"u$i")) ++
      (500 until 1500).map(i => ("b", s"u$i"))
    val df = rows.toDF("seg", "user")
    val path = java.nio.file.Files
      .createTempDirectory("graft-theta-spec").toString + "/sk"
    df.groupBy("seg").agg(ThetaSketch.thetaSketch(col("user")).as("sk"))
      .write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val union = stored
      .agg(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaUnion(col("sk"))).as("e"))
      .head().getDouble(0)
    assert(union == 1500.0, s"exact-mode union: $union")
    val inter = stored
      .agg(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaIntersect(col("sk"))).as("e"))
      .head().getDouble(0)
    assert(inter == 500.0, s"exact-mode intersection: $inter")
    val a = stored.filter($"seg" === "a").select($"sk".as("sk_a"))
    val b = stored.filter($"seg" === "b").select($"sk".as("sk_b"))
    val diff = a.crossJoin(b)
      .select(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaANotB($"sk_a", $"sk_b")).as("e"))
      .head().getDouble(0)
    assert(diff == 500.0, s"exact-mode difference: $diff")
    // duplicates never count twice; estimate is partitioning-blind
    val dup = df.union(df).repartition(7)
      .agg(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaSketch(col("user"))).as("e"))
      .head().getDouble(0)
    assert(dup == 1500.0, s"duplicate-blind distinct: $dup")
  }

  test("estimation mode: 100k distinct at lgK=12 lands within the " +
    "published error band; lgK sizes the trade") {
    val big = (0 until 100000).map(i => s"v$i").toDF("v")
    val est = big.agg(ThetaSketch.thetaEstimate(
      ThetaSketch.thetaSketch(col("v"))).as("e")).head().getDouble(0)
    // rse = 1/sqrt(2^12) ≈ 1.56%; 3.2σ ≈ 5% — deterministic data, so
    // this pins a fixed measured value inside the theoretical band
    assert(math.abs(est - 100000.0) / 100000.0 < 0.05,
      s"estimation-mode error: $est")
    // a bigger sketch estimates tighter on the same stream
    val estBig = big.agg(ThetaSketch.thetaEstimate(
      ThetaSketch.thetaSketch(col("v"), lgK = 16)).as("e"))
      .head().getDouble(0)
    assert(math.abs(estBig - 100000.0) <= math.abs(est - 100000.0),
      s"lgK=16 must not be worse: $estBig vs $est")
  }

  test("SQL surface: theta_* kernels match the Column API; lgK is " +
    "literal-only; empty intersection input is null, not an error") {
    GraftFunctions.register(spark)
    (0 until 300).map(i => (i % 3, i % 100)).toDF("g", "v")
      .createOrReplaceTempView("th_rows")
    val viaSql = spark.sql(
      """SELECT theta_estimate(theta_union_agg(sk)) AS e,
        |       theta_estimate(theta_intersect_agg(sk)) AS i
        |FROM (SELECT g, theta_sketch_agg(v, 12) AS sk
        |      FROM th_rows GROUP BY g)""".stripMargin).head()
    // every residue class holds all 100 values of v % 100 → union =
    // intersection = 100, exact at this size
    assert(viaSql.getDouble(0) == 100.0 && viaSql.getDouble(1) == 100.0,
      s"SQL theta algebra: $viaSql")
    val viaCol = spark.table("th_rows").groupBy("g")
      .agg(ThetaSketch.thetaSketch(col("v").cast("string")).as("sk"))
      .agg(ThetaSketch.thetaEstimate(
        ThetaSketch.thetaUnion(col("sk"))).as("e")).head().getDouble(0)
    assert(viaCol == viaSql.getDouble(0))
    val dif = spark.sql(
      """SELECT theta_estimate(theta_a_not_b(a.sk, b.sk)) AS d
        |FROM (SELECT theta_sketch_agg(v) AS sk FROM th_rows WHERE g = 0) a,
        |     (SELECT theta_sketch_agg(v) AS sk FROM th_rows WHERE g = 1) b
        |""".stripMargin).head().getDouble(0)
    assert(dif == 0.0, s"identical residue sets differ by nothing: $dif")
    val empty = spark.sql(
      "SELECT theta_intersect_agg(sk) FROM (SELECT CAST(NULL AS BINARY) " +
        "AS sk) WHERE sk IS NOT NULL").head()
    assert(empty.isNullAt(0), "empty intersection has no universe sketch")
    val e = intercept[Exception] {
      spark.sql("SELECT theta_sketch_agg(v, CAST(rand() AS INT)) FROM th_rows")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
    val bad = intercept[Exception] {
      spark.sql("SELECT theta_sketch_agg(v, 30) FROM th_rows").collect()
    }
    assert(bad.getMessage.contains("[4, 26]"))
  }

  test("q141 audit anti-vacuity: a corpus missing the 'A'/'R' flags " +
    "emits missing_input rows instead of passing on dropped ops") {
    // r15 advice: before the fixed-op anchor, the intersect/diff legs
    // emptied (or went null) when a flag sketch was absent and the
    // inner join silently dropped those ops — a broken sketch build
    // that produced no 'A'/'R' sketches audited green. This drives the
    // EXACT production statement (thetaSqlAudit, the q141 read side)
    // over a one-flag corpus and demands the violations surface.
    GraftFunctions.register(spark)
    Seq((1L, "N"), (2L, "N"), (3L, "N"))
      .toDF("l_orderkey", "l_returnflag")
      .createOrReplaceTempView("th_oneflag_li")
    spark.sql(
      """SELECT l_returnflag AS flag, theta_sketch_agg(l_orderkey) AS sk
        |FROM th_oneflag_li GROUP BY l_returnflag""".stripMargin)
      .createOrReplaceTempView("th_oneflag_sk")
    val rows = QueriesRelational
      .thetaSqlAudit(spark, "th_oneflag_li", "th_oneflag_sk")
      .as[(String, String)].collect().toSeq
    assert(rows.contains(("intersect", "missing_input")) &&
      rows.contains(("diff", "missing_input")),
      s"dropped-op audit must fail loudly, got: $rows")
    // the present op still audits for real: union estimates 3 exactly
    assert(!rows.exists(_._1 == "union"),
      s"union leg should be green on the one-flag corpus: $rows")
  }
}
