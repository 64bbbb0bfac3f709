package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Connected components / cluster assignment over near-dup pair graphs. */
class ClusterSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components resolve to their min ids") {
    // 1-2-3 chained, 10-11
    val comps = cc(Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges to one component (diameter > 1 iteration)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val comps = cc(chain)
    assert(comps.values.toSet == Set(0L))
    assert(comps.keySet == (0L to 9L).toSet)
  }

  test("a cycle plus a bridge is one component") {
    val comps = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 7L), (8L, 7L)))
    assert(comps.values.toSet == Set(1L))
  }

  test("dedupClusters: every cluster representative maps to itself") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "ddd"), (5L, "eee"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b") // {2,4,5} cluster
    val out = Dedup.dedupClusters(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
    // the assignment is a projection: applying it to representatives is id
    out.values.foreach(rep => assert(out(rep) == rep))
  }

  test("non-convergence within maxIter fails loud, not with split components") {
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("maxIter"))
  }

  test("dedupClusters assigns isolated docs to themselves") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (3L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L, 5L -> 1L))
  }
}
