package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall side of the sketch-operator story (the q57–q62 audits pin
  * precision): every approximate operator must clear its documented
  * recall floor against its exact sibling. q85 enforces the same
  * invariant in the battery; this runs it in-suite at sf0.001 and
  * records the measured values for tuning visibility. */
class SketchRecallSpec extends AnyFunSuite with SparkTestBase {

  test("approximate operators clear their recall floors (sf0.001)") {
    val stats = QueriesLlm.sketchRecall(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(stats.size == 5)
    stats.foreach { r =>
      info(f"${r.getString(0)}%-12s recall=${r.getDouble(1)}%.4f floor=${r.getDouble(2)}%.2f")
    }
    val bad = stats.filter(r => r.getDouble(1) < r.getDouble(2))
    assert(bad.isEmpty, s"recall below floor: ${bad.mkString(", ")}")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("jaccardProbePairs(probeDenom=1) reproduces uncapped jaccardPairs exactly") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val full = pairSet(graft.ops.Dedup.jaccardPairs(docs, threshold = 0.3,
      maxDocFreq = Long.MaxValue, relativeCap = false))
    val probed = pairSet(graft.ops.Dedup.jaccardProbePairs(docs,
      threshold = 0.3, probeDenom = 1))
    assert(full.nonEmpty)
    assert(probed == full)
  }

  test("cosineProbePairs(probeDenom=1) reproduces cosineDupPairs exactly") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val full = pairSet(graft.ops.Similarity.cosineDupPairs(e, threshold = 0.4))
    val probed = pairSet(graft.ops.Similarity.cosineProbePairs(e,
      threshold = 0.4, probeDenom = 1))
    assert(full.nonEmpty)
    assert(probed == full)
  }

  test("probeDenom>1 yields exactly the full pairs touching the probe slice") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val d = 4L
    val full = graft.ops.Dedup.jaccardPairs(docs, threshold = 0.3,
      maxDocFreq = Long.MaxValue, relativeCap = false)
    val expected = pairSet(full.filter(
      pmod(xxhash64(col("id_a")), lit(d)) === 0 ||
        pmod(xxhash64(col("id_b")), lit(d)) === 0))
    val probed = pairSet(graft.ops.Dedup.jaccardProbePairs(docs,
      threshold = 0.3, probeDenom = d))
    assert(expected.nonEmpty, "probe slice at denom=4 should touch some pairs")
    assert(probed == expected)
  }

  test("cachedGroundTruth: computes once, later calls read the identical " +
    "frame back; empty frames round-trip via the schema sidecar") {
    import spark.implicits._
    var computes = 0
    val key = s"spec-${java.util.UUID.randomUUID()}"
    def frame = {
      computes += 1
      Seq((1L, 2L, 0.5), (3L, 4L, 0.9)).toDF("id_a", "id_b", "j")
    }
    val a = QueriesLlm.cachedGroundTruth(spark, key)(frame)
    val aRows = canon(a)
    assert(computes == 1)
    val b = QueriesLlm.cachedGroundTruth(spark, key)(frame)
    assert(computes == 1,
      "second call must serve from the cache, not recompute the sibling")
    assert(canon(b) == aRows)
    assert(b.schema == a.schema)
    // an empty exact set writes no parquet part files; the schema sidecar
    // must still reconstruct the empty frame on a hit
    val ek = s"spec-empty-${java.util.UUID.randomUUID()}"
    val e1 = QueriesLlm.cachedGroundTruth(spark, ek)(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    val e2 = QueriesLlm.cachedGroundTruth(spark, ek)(
      fail("an empty-frame cache hit must not recompute"))
    assert(e2.schema == e1.schema)
    assert(e2.count() == 0)
  }
}
