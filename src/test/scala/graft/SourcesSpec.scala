package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.config.PipelineSpec
import graft.core.Runner
import graft.sources.{Sources, SourceSpec}

/** Non-parquet sources (SURVEY Layer B "Scans"): csv/json/orc round-trips
  * through Sources.read, YAML plumbing into StageSpec, and jdbc config
  * validation (a live DB isn't available offline — the jdbc test asserts
  * our plumbing hands the config to Spark's jdbc source, which then fails
  * at the driver-manager layer, not in our code). */
class SourcesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"))

  private def writeFixture(fmt: String): String = {
    val dir = Files.createTempDirectory(s"graft-src-$fmt").toString + "/data"
    val df = rows.toDF("id", "name")
    fmt match {
      case "csv" => df.write.option("header", "true").csv(dir)
      case other => df.write.format(other).save(dir)
    }
    dir
  }

  test("csv source reads with declared schema (no inference pass)") {
    val out = Sources.read(spark, SourceSpec("csv", writeFixture("csv"),
      schema = "id LONG, name STRING", options = Map("header" -> "true")))
    assert(out.schema.simpleString == "struct<id:bigint,name:string>")
    assert(canon(out) == canon(rows.toDF("id", "name")))
  }

  test("json source reads with declared schema") {
    val out = Sources.read(spark, SourceSpec("json", writeFixture("json"),
      schema = "id LONG, name STRING"))
    assert(canon(out) == canon(rows.toDF("id", "name")))
  }

  test("orc source round-trips") {
    val out = Sources.read(spark, SourceSpec("orc", writeFixture("orc")))
    assert(canon(out) == canon(rows.toDF("id", "name")))
  }

  test("text source reads one value row per line; wholetext collapses a " +
    "file to one row; a declared schema is refused (the schema is fixed)") {
    val dir = Files.createTempDirectory("graft-src-text").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.log"), "x\ny\nz".getBytes("UTF-8"))
    val lines = Sources.read(spark, SourceSpec("text", dir))
    assert(lines.schema.simpleString == "struct<value:string>")
    assert(lines.as[String].collect().sorted.toSeq == Seq("x", "y", "z"))
    val whole = Sources.read(spark, SourceSpec("text", dir,
      options = Map("wholetext" -> "true")))
    assert(whole.as[String].collect().toSeq == Seq("x\ny\nz"))
    val e = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("text", dir, schema = "value STRING"))
    }
    assert(e.getMessage.contains("value STRING"))
  }

  test("binary source: one row per raw asset file with its bytes; " +
    "pathGlobFilter prunes non-assets; fixed schema refuses a declared one") {
    val dir = Files.createTempDirectory("graft-src-bin").toString
    val png = graft.ops.Multimodal.syntheticPng(5L)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a_5.png"), png)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "junk.txt"), "no".getBytes("UTF-8"))
    val out = Sources.read(spark, SourceSpec("binary", dir,
      options = Map("pathGlobFilter" -> "*.png")))
    val row = out.select("path", "length", "content").collect()
    assert(row.length == 1, "the .txt decoy must be glob-pruned")
    assert(row(0).getString(0).endsWith("a_5.png"))
    assert(row(0).getLong(1) == png.length &&
      row(0).getAs[Array[Byte]](2).toSeq == png.toSeq,
      "content carries the exact file bytes")
    // alias and fixed-schema refusal
    assert(Sources.read(spark, SourceSpec("binaryFile", dir)).count() == 2)
    val e = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("binary", dir, schema = "content BINARY"))
    }
    assert(e.getMessage.contains("fixed schema"))
  }

  test("unknown format and missing path fail eagerly with clear messages") {
    val e1 = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("avroish", "/tmp/x"))
    }
    assert(e1.getMessage.contains("unknown source format"))
    val e2 = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("csv"))
    }
    assert(e2.getMessage.contains("requires a path"))
  }

  test("jdbc source validates url/dbtable config before touching Spark") {
    val e1 = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("jdbc"))
    }
    assert(e1.getMessage.contains("url"))
    val e2 = intercept[IllegalArgumentException] {
      Sources.read(spark, SourceSpec("jdbc",
        options = Map("url" -> "jdbc:postgresql://h/db")))
    }
    assert(e2.getMessage.contains("dbtable"))
  }

  test("jdbc round-trip against a live embedded Derby (write, read, append)") {
    // Derby ships on Spark's classpath — the one live database this
    // container has; write and read use the exact codepath a
    // MySQL/Postgres deployment would, minus the network
    val url = "jdbc:derby:memory:graft_sources_spec;create=true"
    val drv = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    Sources.writeJdbc(df, url, "t_rt", SaveMode.Overwrite, drv)
    val back0 = Sources.read(spark, SourceSpec("jdbc",
      options = drv ++ Map("url" -> url, "dbtable" -> "t_rt")))
    // Derby uppercases unquoted identifiers; fold back for comparison
    val back = back0.toDF(back0.columns.map(_.toLowerCase): _*)
    assertSameRows(df.orderBy("id"), back.orderBy("id"))
    // append mode adds rows; overwrite replaces them
    Sources.writeJdbc(Seq((3L, "gamma")).toDF("id", "name"),
      url, "t_rt", SaveMode.Append, drv)
    assert(Sources.read(spark, SourceSpec("jdbc",
      options = drv ++ Map("url" -> url, "dbtable" -> "t_rt"))).count() == 3)
    Sources.writeJdbc(df, url, "t_rt", SaveMode.Overwrite, drv)
    assert(Sources.read(spark, SourceSpec("jdbc",
      options = drv ++ Map("url" -> url, "dbtable" -> "t_rt"))).count() == 2)
  }

  test("jdbc config reaches Spark's jdbc source (fails at connection, not in our plumbing)") {
    val e = intercept[Exception] {
      Sources.read(spark, SourceSpec("jdbc", options = Map(
        "url" -> "jdbc:postgresql://localhost:1/nope",
        "dbtable" -> "t",
        "driver" -> "no.such.Driver")))
    }
    // ClassNotFound for the driver class proves the options were handed
    // to the JDBC relation provider
    assert(e.getMessage.contains("no.such.Driver"))
  }

  test("YAML stage sources parse into SourceSpec and register as views for the extract") {
    val csvDir = writeFixture("csv")
    val yaml =
      s"""pypes:
         |  s:
         |    extract_query: "SELECT id, upper(name) AS name FROM my_src WHERE id <= 2"
         |    sources:
         |      my_src:
         |        format: csv
         |        path: $csvDir
         |        schema: "id LONG, name STRING"
         |        options: {header: "true"}
         |""".stripMargin
    val spec = PipelineSpec.fromYaml(yaml)
    val src = spec.stages("s").sources("my_src")
    assert(src.format == "csv" && src.path == csvDir
      && src.options == Map("header" -> "true"))
    val out = new Runner(spark, spec).extract(spec.stages("s"), Map.empty)
    assert(canon(out) == canon(Seq((1L, "A"), (2L, "B")).toDF("id", "name")))
  }

  test("stage source missing format fails at parse time") {
    val e = intercept[IllegalArgumentException] {
      PipelineSpec.fromYaml(
        """pypes:
          |  s:
          |    extract_query: "SELECT 1"
          |    sources:
          |      v: {path: /tmp/x}
          |""".stripMargin)
    }
    assert(e.getMessage.contains("format"))
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import spark.implicits._
    // the in-memory catalog is fresh per JVM but the warehouse dir is
    // not: clear both name and location from any previous run
    Seq("bkt_left", "bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val l = (1 to 100).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val r = (1 to 100).map(i => (i.toLong, i * 10)).toDF("k", "rv")
    Sources.writeBucketed(l, "bkt_left", "k", 4)
    Sources.writeBucketed(r, "bkt_right", "k", 4)
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
    assert(joined.count() == 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }

  test("writeClustered: files cover disjoint ranges of the cluster column, content intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-clu").toString + "/t"
    // scrambled insert order: clustering must impose the physical order
    val df = spark.range(0, 1000)
      .select((col("id") * 37 % 1000).as("k"), col("id").as("v"))
    Sources.writeClustered(df, dir, Seq("k"), numFiles = 5)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("v")).head.getLong(0) == (0L until 1000L).sum)
    // per-file [min, max] of k must not overlap — that disjointness is
    // exactly what makes parquet min/max stats skip files under a range
    // filter
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ => ()
    }
  }

  test("writeZOrdered: EVERY cluster column gets tight per-file ranges; " +
    "a lexicographic sort only serves its leading column; content intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a full 64x64 grid: both dims uniform, so per-file spread is a pure
    // measure of the layout (16 files; a perfect Morton layout gives each
    // file a 16x16 block = spread 15/63 ≈ 0.24 per dim)
    val grid = for { a <- 0 until 64; b <- 0 until 64 }
      yield (a.toDouble, b.toDouble)
    val df = grid.toDF("a", "b")
    val zdir = Files.createTempDirectory("graft-zord").toString + "/z"
    val ldir = Files.createTempDirectory("graft-zord").toString + "/l"
    Sources.writeZOrdered(df, zdir, Seq("a", "b"), bitsPerCol = 6, numFiles = 16)
    Sources.writeClustered(df, ldir, Seq("a", "b"), numFiles = 16)
    def avgSpread(dir: String, c: String): Double =
      spark.read.parquet(dir).groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("s"))
        .agg(avg("s")).head().getDouble(0) / 63.0
    // z-order: BOTH columns skippable. The aligned-ideal spread is 0.24
    // (16x16 blocks); since the exchange ranges on the QUADRANT id (the
    // curve value's top bits) rather than sampled curve values, file
    // cuts fall ON quadrant boundaries — files cover whole 16x16 blocks
    // (occasionally an adjacent pair when the sampler merges two), so
    // the measured average sits at ~the ideal instead of the sampled
    // layout's ~0.45
    assert(avgSpread(zdir, "a") < 0.35, s"z spread a = ${avgSpread(zdir, "a")}")
    assert(avgSpread(zdir, "b") < 0.35, s"z spread b = ${avgSpread(zdir, "b")}")
    // lexicographic: perfect on the leading column, useless on the other
    assert(avgSpread(ldir, "a") < 0.15, s"lex spread a = ${avgSpread(ldir, "a")}")
    assert(avgSpread(ldir, "b") > 0.90, s"lex spread b = ${avgSpread(ldir, "b")}")
    // content is a layout-only change
    assert(spark.read.parquet(zdir).as[(Double, Double)].collect().toSet
      == grid.toSet)
    // strings have no quantile arithmetic — refused loudly
    val e = intercept[IllegalArgumentException](Sources.writeZOrdered(
      Seq(("x", 1.0)).toDF("s", "v"), zdir + "2", Seq("s", "v")))
    assert(e.getMessage.contains("numeric"), e.getMessage)
    // empty input: nothing to layout, written as-is (no NPE on the
    // boundary row)
    Sources.writeZOrdered(df.limit(0), zdir + "3", Seq("a", "b"))
    assert(spark.read.parquet(zdir + "3").count() == 0)
    // an entirely-NULL cluster column refuses LOUDLY naming the column —
    // whichever position it sits in: a null FIRST column must not be
    // misread as empty input (silently un-ordered), a null SECOND must
    // not NPE on the boundary row
    val nullCol = lit(null).cast("double")
    for (cols <- Seq(Seq("a", "n"), Seq("n", "a"))) {
      val en = intercept[IllegalArgumentException](Sources.writeZOrdered(
        df.withColumn("n", nullCol), zdir + "4", cols))
      assert(en.getMessage.contains("'n'") || en.getMessage.contains(" n "),
        en.getMessage)
    }
    // rows with SOME nulls still write: they sort to the null region
    Sources.writeZOrdered(
      df.withColumn("a",
        when(col("a") === 0.0 && col("b") === 0.0, nullCol).otherwise(col("a"))),
      zdir + "5", Seq("a", "b"))
    assert(spark.read.parquet(zdir + "5").count() == 64 * 64)
  }

  test("saltedJoin matches the plain join on a skewed key distribution") {
    import spark.implicits._
    // 1000 rows of one hot key + a tail; small side has 10 keys
    val big = ((1 to 1000).map(_ => 1L) ++ (2L to 10L)).toDF("k")
    val small = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    val salted = graft.ops.Skew.saltedJoin(big, small, "k", salts = 8)
    val plain = big.join(small, "k")
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 1009)
  }
}
