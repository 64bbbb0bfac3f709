package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrequentItemsAggregator

/** Pure-JVM properties of the Misra–Gries summary (Agarwal et al. 2012)
  * under RANDOM merge trees — the exact claim that makes it a partial
  * aggregate Spark may combine in any order: for every item with true
  * count `t` over `n` inputs, a carried estimate `e` satisfies
  * `t - n/(cap+1) <= e <= t`, every item with `t > n/(cap+1)` is
  * present, and the summary never exceeds `cap` entries. No SparkSession
  * — reduce/merge are driven directly, so the cases are many and the
  * merge shapes (chunk sizes, merge order) are adversarially random
  * rather than whatever partitioning one cluster run happens to deal.
  * The Spark-side plan shape (partial below the exchange) is pinned in
  * PlanSpec; the battery replays the same bounds on real data (q128 via
  * the Column API, q131 via SQL). */
class FrequentItemsPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val p = Gen.Parameters.default.withSize(60)
    Iterator.from(0)
      .map(i => gen.apply(p, Seed(11L + 1000L * i)))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  // skewed vocabulary: a few genuinely heavy hitters over a long tail,
  // so the presence guarantee actually has items to bite on
  private val itemGen: Gen[String] = Gen.frequency(
    30 -> Gen.const("heavy1"), 18 -> Gen.const("heavy2"),
    9 -> Gen.const("mid1"), 6 -> Gen.const("mid2"),
    1 -> Gen.chooseNum(0, 199).map(i => s"tail$i"))

  private val caseGen: Gen[(Int, List[String], Long)] = for {
    cap <- Gen.chooseNum(1, 8)
    n <- Gen.chooseNum(1, 400)
    items <- Gen.listOfN(n, itemGen)
    mergeSeed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield (cap, items, mergeSeed)

  test("property: MG bounds, presence, and capacity hold under random " +
    "chunkings and random merge trees") {
    samples(caseGen, n = 60).foreach { case (cap, items, mergeSeed) =>
      val agg = new FrequentItemsAggregator(cap)
      val rnd = new scala.util.Random(mergeSeed)
      // random chunking = an arbitrary partitioning of the input
      val chunks = scala.collection.mutable.Buffer[List[String]]()
      var rest = items
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.size)
        chunks += rest.take(k); rest = rest.drop(k)
      }
      // per-chunk partials via reduce (the map side)
      val pool = scala.collection.mutable.Buffer(
        chunks.map(_.foldLeft(agg.zero)(agg.reduce)).toSeq: _*)
      // random binary merge tree (the exchange + final merge, any shape)
      while (pool.size > 1) {
        val i = rnd.nextInt(pool.size); val a = pool.remove(i)
        val j = rnd.nextInt(pool.size); val b = pool.remove(j)
        pool += agg.merge(a, b)
      }
      val sk = agg.finish(pool.head)
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val slack = items.size.toDouble / (cap + 1)
      assert(sk.size <= cap, s"cap=$cap n=${items.size}: summary size ${sk.size}")
      sk.foreach { case (k, e) =>
        val t = exact.getOrElse(k, 0L)
        assert(e <= t, s"cap=$cap: $k overestimated ($e > $t)")
        assert(t - e <= slack, s"cap=$cap n=${items.size}: $k est $e vs $t")
      }
      exact.foreach { case (k, t) =>
        if (t > slack)
          assert(sk.contains(k),
            s"cap=$cap n=${items.size}: guaranteed-heavy $k (t=$t) missing")
      }
    }
  }
}
