package graft

import java.nio.file.Files

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
}
