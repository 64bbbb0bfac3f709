package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAggregator}

/** The typed top-k aggregator: bounded-buffer invariants and agreement
  * with the sort-everything oracle under any fold/merge order. */
class TopKSpec extends AnyFunSuite {

  private val k = 5
  private val agg = new TopKAggregator(k)

  private def oracle(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortWith((a, b) =>
      a.score > b.score || (a.score == b.score && a.id < b.id)).take(k)

  private def foldAll(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def gen: Gen[List[ScoredId]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 9), Gen.choose(0L, 100L))
      .map { case (s, i) => ScoredId(s.toDouble, i) })

  private def samples(n: Int = 20): Seq[List[ScoredId]] = {
    val p = Gen.Parameters.default.withSize(30)
    Iterator.from(0).map(i => gen.apply(p, Seed(7L + i)))
      .collect { case Some(a) => a }.take(n).toSeq
  }

  test("reduce-fold matches the full-sort oracle") {
    samples().foreach { xs =>
      assert(agg.finish(foldAll(xs)) == oracle(xs), s"input $xs")
    }
  }

  test("buffer never exceeds k during the fold") {
    samples().foreach { xs =>
      xs.scanLeft(agg.zero)(agg.reduce).foreach(b => assert(b.size <= k))
    }
  }

  test("merge of any split equals the fold of the whole (partition independence)") {
    samples().foreach { xs =>
      (0 to xs.size by math.max(1, xs.size / 3)).foreach { cut =>
        val (l, r) = xs.splitAt(cut)
        val merged = agg.merge(foldAll(l), foldAll(r))
        assert(agg.finish(merged) == oracle(xs))
      }
    }
  }

  test("ties on score break by ascending id — deterministic under input order") {
    val tied = List(ScoredId(1.0, 3), ScoredId(1.0, 1), ScoredId(1.0, 2),
      ScoredId(1.0, 5), ScoredId(1.0, 4), ScoredId(1.0, 0))
    assert(agg.finish(foldAll(tied)).map(_.id) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(agg.finish(foldAll(tied.reverse)).map(_.id) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("fewer than k inputs are all kept, sorted") {
    val xs = List(ScoredId(2.0, 7), ScoredId(9.0, 1))
    assert(agg.finish(foldAll(xs)) == List(ScoredId(9.0, 1), ScoredId(2.0, 7)))
  }
}
