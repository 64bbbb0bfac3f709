package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}
import graft.ops.Dedup

/** The SQL surface of the native kernels: post-hoc registration on a
  * live session, build-time injection via SparkSessionExtensions, and
  * the literal-argument contract. */
class GraftFunctionsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("register(): SQL kernels match their Column-API twins") {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox jumps the quick brown fox"),
      (2L, "hello world"))
      .toDF("id", "text").createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash64(split(text, ' ')) AS h,
        |  top_bigram_count(split(text, ' ')) AS tb,
        |  minhash_sig(transform(split(text, ' '), t -> xxhash64(t)), 8) AS sig
        |FROM gf_docs""".stripMargin)
    val viaCols = spark.table("gf_docs").select(col("id"),
      Dedup.simhash(col("text")).as("h"),
      graft.functions.SketchExprs.topBigramCount(split(col("text"), " ")).as("tb"),
      Dedup.minhashSignature(
        transform(split(col("text"), " "), t => xxhash64(t)), 8).as("sig"))
    // simhash: Dedup.simhash tokenizes internally the same way; sig
    // arrays compare element-wise via canon
    assertSameRows(
      viaSql.select(col("id"), col("h"), col("tb"), concat_ws(",", col("sig")).as("s")),
      viaCols.select(col("id"), col("h"), col("tb"), concat_ws(",", col("sig")).as("s")))
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").as[Double].head()
    assert(dot == 11.0)
  }

  test("wordGramMinhash: fused signer is bit-identical to the " +
    "shingle→hash→sig chain, hostile inputs included") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox", // exactly > k tokens
      "a b c",               // exactly k tokens -> one gram
      "a b",                 // < k tokens -> whole-text gram
      "solo",                // single token
      "",                    // empty text
      "a  b   c d",          // multi-space (un-normalized callers)
      "日本語 テキスト の 例 です",  // multi-byte UTF-8 tokens
      "dup dup dup dup dup") // duplicate grams (distinct-insensitivity)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val fused = df.select(col("id"),
      graft.functions.SketchExprs.wordGramMinhash(col("text"), 3, 32).as("sig"))
    val chained = df.select(col("id"),
      Dedup.minhashSignature(
        Dedup.hashShingles(Dedup.shingles(col("text"), 3)), 32).as("sig"))
    assertSameRows(
      fused.select(col("id"), concat_ws(",", col("sig")).as("s")),
      chained.select(col("id"), concat_ws(",", col("sig")).as("s")))
  }

  test("cardinality args must be integer literals — loud failure otherwise") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), CAST(rand() * 8 AS INT))").collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
  }

  test("freq_items through spark.sql matches the Column-API twin and " +
    "keeps the MG bounds") {
    GraftFunctions.register(spark)
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++
      (1 to 26).map(i => s"t$i")
    // one partition → one deterministic reduce chain, so SQL and Column
    // twins must be map-identical (multi-partition runs only promise
    // the audited invariants — see FrequentItemsAggregator scaladoc)
    toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tok").repartition(1).createOrReplaceTempView("gf_toks")
    val viaSql = spark.sql(
      "SELECT freq_items(tok, 4) AS sketch FROM gf_toks")
      .as[Map[String, Long]].head()
    val viaCol = spark.table("gf_toks")
      .agg(graft.functions.FrequentItems.freqItems(col("tok"), 4).as("sketch"))
      .as[Map[String, Long]].head()
    assert(viaSql == viaCol, "SQL surface must be the same aggregator")
    // invariants regardless of partitioning: n/(cap+1) = 100/5 = 20, so
    // a (40) and b (25) are guaranteed present with e in [t - 20, t]
    assert(viaSql.contains("a") && viaSql.contains("b"))
    assert(viaSql("a") <= 40 && viaSql("a") >= 20)
    assert(viaSql("b") <= 25 && viaSql("b") >= 5)
    assert(viaSql.size <= 4, "summary never exceeds capacity")
    // non-string items cast through — profile a numeric column directly
    val num = spark.sql("SELECT freq_items(id % 3, 4) AS sk FROM gf_toks")
      .as[Map[String, Long]].head()
    assert(num.keySet.subsetOf(Set("0", "1", "2")) && num.values.sum <= 100)
    val e = intercept[Exception] {
      spark.sql("SELECT freq_items(tok, CAST(rand() * 8 AS INT)) FROM gf_toks")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
    // absurd capacities refuse loudly instead of OOMing an executor
    val big = intercept[Exception] {
      spark.sql("SELECT freq_items(tok, 2000000) FROM gf_toks").collect()
    }
    assert(big.getMessage.contains("exceeds"))
  }

  test("freq_items_merge rolls up stored summaries with the MG bounds intact") {
    GraftFunctions.register(spark)
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++
      (1 to 26).map(i => s"t$i")
    toks.zipWithIndex.map { case (t, i) => (i % 8, t) }
      .toDF("shard", "tok").createOrReplaceTempView("gfm_toks")
    // warehouse shape: per-shard stored summaries, corpus answer from
    // the rollup only — no raw re-scan in the outer query
    val merged = spark.sql(
      """SELECT freq_items_merge(sk, 4) AS sk FROM (
        |  SELECT freq_items(tok, 4) AS sk FROM gfm_toks GROUP BY shard)""".stripMargin)
      .as[Map[String, Long]].head()
    // n/(cap+1) = 100/5 = 20: a (40) and b (25) survive ANY merge order
    assert(merged.contains("a") && merged.contains("b"))
    assert(merged("a") <= 40 && merged("a") >= 20)
    assert(merged("b") <= 25 && merged("b") >= 5)
    assert(merged.size <= 4)
    // Column twin drives the same aggregator
    val viaCol = spark.table("gfm_toks").groupBy("shard")
      .agg(graft.functions.FrequentItems.freqItems(col("tok"), 4).as("sk"))
      .agg(graft.functions.FrequentItems.freqItemsMerge(col("sk"), 4).as("sk"))
      .as[Map[String, Long]].head()
    assert(viaCol.contains("a") && viaCol.contains("b") && viaCol.size <= 4)
    val e = intercept[Exception] {
      spark.sql("SELECT freq_items_merge(map('x', id), CAST(id AS INT)) FROM range(3)")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
  }

  test("hist_bin/hist_quantile/hist_psi: the profile family builds and " +
    "reads fixed-bin sketches from plain SQL") {
    GraftFunctions.register(spark)
    val rows = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 500.0),
      ("b", 5.0), ("b", 15.0), ("b", -3.0))
    rows.toDF("g", "v").createOrReplaceTempView("gh_rows")
    // the sketch BUILD in plain SQL: GROUP BY hist_bin == histSketch
    val viaSql = spark.sql(
      """SELECT g, map_from_entries(sort_array(
        |         collect_list(struct(bin, cnt)))) AS hist
        |FROM (SELECT g, hist_bin(v, 0, 100, 10) AS bin,
        |             count(1) AS cnt
        |      FROM gh_rows WHERE v IS NOT NULL GROUP BY 1, 2)
        |GROUP BY g""".stripMargin)
    val viaCol = graft.ops.Profiling.histSketch(
      spark.table("gh_rows"), "v", 0, 100, 10, Seq("g"))
    assertSameRows(
      viaSql.select(col("g"), sort_array(map_entries(col("hist"))).as("h")),
      viaCol.select(col("g"), sort_array(map_entries(col("hist"))).as("h")))
    // the READ side over the stored maps: quantile + drift in SQL match
    // the Column twins (and carry binOf's under/overflow contract)
    viaSql.createOrReplaceTempView("gh_sketches")
    val read = spark.sql(
      """SELECT a.g, hist_quantile(a.hist, 0, 100, 10, 0.5) AS med,
        |       hist_psi(a.hist, b.hist) AS drift,
        |       hist_psi(a.hist, a.hist) AS self_drift
        |FROM gh_sketches a JOIN gh_sketches b ON a.g = 'a' AND b.g = 'b'
        |""".stripMargin).head()
    // g=a: values 10/20/30/500 -> median rank 2 = 20 -> bin 2, left edge 20
    assert(read.getDouble(1) == 20.0, s"median read: $read")
    assert(read.getDouble(3) == 0.0, "identical profiles have zero drift")
    val twin = spark.table("gh_sketches").as("x")
      .join(spark.table("gh_sketches").as("y"),
        col("x.g") === lit("a") && col("y.g") === lit("b"))
      .select(graft.ops.Profiling.histPsi(col("x.hist"), col("y.hist")))
      .head().getDouble(0)
    assert(read.getDouble(2) == twin && twin > 0.0,
      s"SQL psi must be the Column kernel: ${read.getDouble(2)} vs $twin")
    // range/q parameters are literal-only — loud failure otherwise
    val e = intercept[Exception] {
      spark.sql("SELECT hist_bin(v, v, 100, 10) FROM gh_rows").collect()
    }
    assert(e.getMessage.contains("NUMERIC literal"))
    // and scientific/decimal literal forms all fold (2e2, 0.5)
    assert(spark.sql(
      "SELECT hist_quantile(map(1, 1L), 0, 2e2, 10, 0.5) AS q").head()
      .getDouble(0) == 20.0)
  }

  test("deflate_ratio: deterministic zlib signal — repetition compresses, " +
    "levels are literal-only construction params") {
    GraftFunctions.register(spark)
    val boiler = Array.fill(200)("spam spam buy now").mkString(" ")
    val prose = (1 to 200).map(i => s"word$i item${i * 7 % 113}").mkString(" ")
    val df = Seq((1L, boiler), (2L, prose), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    df.createOrReplaceTempView("dr_docs")
    val out = spark.sql(
      """SELECT id, deflate_ratio(text) AS r, deflate_ratio(text, 1) AS r1
        |FROM dr_docs ORDER BY id""".stripMargin)
      .collect()
    val r = out.map(x => x.getLong(0) ->
      (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r(1L).get < 0.1, s"boilerplate must compress hard: ${r(1L)}")
    assert(r(1L).get < r(2L).get && r(2L).get < 1.1,
      s"varied prose compresses less: $r")
    assert(r(3L).contains(1.0), "empty input reports 1.0, never div-by-zero")
    assert(r(4L).isEmpty, "null text stays null")
    // a faster level compresses no better than the default
    assert(out(0).getDouble(2) >= r(1L).get)
    // twice the SAME call is bit-identical (thread-local deflater reuse
    // across rows cannot leak state between inputs)
    val twice = spark.sql(
      "SELECT deflate_ratio(text) = deflate_ratio(text) AS eq FROM dr_docs " +
        "WHERE text IS NOT NULL")
      .collect().map(_.getBoolean(0))
    assert(twice.forall(identity))
    // Column twin is the same kernel
    val viaCol = df.filter($"id" === 1L)
      .select(graft.ops.TextAnalysis.compressionRatio($"text")).head().getDouble(0)
    assert(viaCol == r(1L).get)
    // literal + range contracts
    val e = intercept[Exception] {
      spark.sql("SELECT deflate_ratio(text, CAST(rand() AS INT)) FROM dr_docs")
        .collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
    val bad = intercept[Exception] {
      spark.sql("SELECT deflate_ratio(text, 12) FROM dr_docs").collect()
    }
    assert(bad.getMessage.contains("[1, 9]"))
  }

  test("GraftSession.builder: configured session has kernels and the scale knobs") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val gs = GraftSession.builder(shufflePartitions = 8)
        .master("local[4]").getOrCreate()
      assert(gs ne shared)
      assert(gs.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(gs.conf.get("spark.sql.shuffle.partitions") == "8")
      val d = gs.sql("SELECT vec_dot(array(2.0D), array(3.0D)) AS d")
        .collect().head.getDouble(0)
      assert(d == 6.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("GraftSession.create: shuffle partitions derive from defaultParallelism") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val gs = GraftSession.create(configure = _.master("local[4]"))
      assert(gs.conf.get("spark.sql.shuffle.partitions") ==
        (3 * gs.sparkContext.defaultParallelism).toString)
      // explicit pin still wins
      val pinned = GraftSession.create(shufflePartitions = 7,
        configure = _.master("local[4]"))
      assert(pinned.conf.get("spark.sql.shuffle.partitions") == "7")
      // a value pinned directly on the (now pre-existing) session
      // survives a later create(): the derivation only applies to a
      // session this call actually created
      pinned.conf.set("spark.sql.shuffle.partitions", "5")
      val again = GraftSession.create(configure = _.master("local[4]"))
      assert(again eq pinned)
      assert(again.conf.get("spark.sql.shuffle.partitions") == "5",
        "create() clobbered a deliberately pinned value on a pre-existing session")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("withExtensions(GraftExtensions): kernels available without explicit registration") {
    // a NEW session over the same SparkContext, built with the
    // extensions — getOrCreate would return the shared session, so the
    // active/default slots are cleared first and restored after
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(ext ne shared)
      val d = ext.sql(
        "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 1.0D, 1.0D)) AS d")
        .collect().head.getDouble(0)
      assert(d == 6.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("QuantileBucket + InterleaveBits: equi-depth bucketing and the " +
    "Morton interleave, via codegen and eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bounds = Array(10.0, 20.0, 30.0) // 4 buckets
    val df = Seq(
      (Some(5.0)), (Some(10.0)), (Some(15.0)), (Some(29.9)),
      (Some(30.0)), (Some(99.0)), (None: Option[Double]),
      (Some(Double.NaN))).toDF("v")
    val out = df.select(graft.functions.ZOrderExprs
      .quantileBucket(col("v"), bounds).as("b")).as[Int].collect().toSeq
    // below-first -> 0; on-boundary -> bucket above; above-last -> 3;
    // null and NaN -> 0 (curve origin)
    assert(out == Seq(0, 1, 1, 2, 3, 3, 0, 0), out.toString)
    // interleave: a=0b0011 (3), b=0b0101 (5), 4 bits each
    //   z bit (j*2 + i): pairs (a0,b0)(a1,b1)(a2,b2)(a3,b3)
    //   = bits 1,1 | 1,0 | 0,1 | 0,0 -> 0b00100111 = 39
    val z = Seq((3, 5)).toDF("a", "b").select(graft.functions.ZOrderExprs
      .interleaveBits(Seq(col("a"), col("b")), 4).as("z"))
      .as[Long].head()
    assert(z == 39L, s"expected 39, got $z")
    // locality: adjacent cells differ less in z than distant ones
    def zOf(a: Int, b: Int): Long = Seq((a, b)).toDF("a", "b")
      .select(graft.functions.ZOrderExprs
        .interleaveBits(Seq(col("a"), col("b")), 4).as("z")).as[Long].head()
    assert(math.abs(zOf(4, 4) - zOf(4, 5)) < math.abs(zOf(4, 4) - zOf(4, 12)))
    // interpreted eval matches the codegen'd path
    val expr = graft.functions.InterleaveBits(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(3),
      org.apache.spark.sql.catalyst.expressions.Literal(5)), 4)
    assert(expr.eval(null) == 39L)
    assert(graft.functions.QuantileBucket.bucketOf(10.0, bounds) == 1)
    assert(graft.functions.QuantileBucket.bucketOf(9.999, bounds) == 0)
  }
}
