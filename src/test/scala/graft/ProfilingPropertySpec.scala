package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WindowDriftAggregator

/** Pure-JVM properties of the fixed-bin window profiler behind
  * `Streams.windowedDriftAlert` — the claims that make it a partial
  * aggregate Spark may combine in any order, checked under
  * adversarially RANDOM chunkings and merge trees rather than whatever
  * partitioning one run deals:
  *   - exact mergeability: any merge tree over any chunking yields the
  *     SAME histogram as a direct one-pass count (the fixed-bin trade's
  *     whole point — zero re-estimation drift);
  *   - binOf contract at the aggregator level: under/overflow carried
  *     in -1/nbins, counts conserve n;
  *   - PSI invariants: self-drift is exactly 0, the score is symmetric
  *     and non-negative ((p_a−p_b) and ln(p_a/p_b) always share sign).
  * The Spark-side bitwise parity with Profiling.histPsi and the
  * streaming e2e live in StreamsSpec; the battery replays the batch
  * kernels in q133/q134/q135. */
class ProfilingPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val p = Gen.Parameters.default.withSize(60)
    Iterator.from(0)
      .map(i => gen.apply(p, Seed(23L + 1000L * i)))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  // values straddle the [0, 100) range so under/overflow bins get mass
  private val valueGen: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(0.0, 99.999),
    1 -> Gen.chooseNum(-50.0, -0.001),
    1 -> Gen.chooseNum(100.0, 500.0))

  private val caseGen: Gen[(Int, List[Double], Long)] = for {
    nbins <- Gen.chooseNum(1, 16)
    n <- Gen.chooseNum(0, 300)
    vs <- Gen.listOfN(n, valueGen)
    seed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield (nbins, vs, seed)

  /** Fold `vs` through reduce, chunked and merged in a random tree. */
  private def randomTree(
      agg: WindowDriftAggregator,
      vs: List[Double],
      rnd: scala.util.Random): Array[Long] = {
    if (vs.isEmpty) agg.zero
    else {
      // random chunking
      var chunks = List.newBuilder[Array[Long]]
      var rest = vs
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.length)
        val (h, t) = rest.splitAt(take)
        chunks += h.foldLeft(agg.zero)(agg.reduce)
        rest = t
      }
      // random merge order
      var bufs = rnd.shuffle(chunks.result())
      while (bufs.length > 1) {
        val i = rnd.nextInt(bufs.length - 1)
        val merged = agg.merge(bufs(i), bufs(i + 1))
        bufs = bufs.patch(i, Seq(merged), 2)
      }
      bufs.head
    }
  }

  test("exact mergeability: any chunking + merge tree equals the direct " +
    "one-pass histogram, and counts conserve n") {
    val ref = Map(0 -> 3L, 1 -> 1L) // fixed non-empty reference
    samples(caseGen, 200).foreach { case (nbins, vs, seed) =>
      val agg = new WindowDriftAggregator(0.0, 100.0, nbins, ref)
      val direct = vs.foldLeft(agg.zero)(agg.reduce)
      val treed = randomTree(agg, vs, new scala.util.Random(seed))
      val (d, t) = (agg.finish(direct), agg.finish(treed))
      assert(d.hist == t.hist && d.n == t.n,
        s"merge tree must be invisible (nbins=$nbins, n=${vs.length}): " +
          s"${d.hist} vs ${t.hist}")
      assert(d.n == vs.length, s"counts conserve n: ${d.n} vs ${vs.length}")
      assert(d.hist.keys.forall(b => b >= -1 && b <= nbins),
        s"bins live in [-1, nbins]: ${d.hist.keys}")
      assert(d.hist.values.sum == vs.length)
    }
  }

  test("PSI invariants: self-drift 0, symmetric, non-negative") {
    val histGen: Gen[Map[Int, Long]] = for {
      nbins <- Gen.chooseNum(1, 12)
      entries <- Gen.nonEmptyListOf(for {
        b <- Gen.chooseNum(-1, nbins)
        c <- Gen.chooseNum(1L, 50L)
      } yield b -> c)
    } yield entries.toMap
    samples(Gen.zip(histGen, histGen), 200).foreach { case (a, b) =>
      def psi(x: Map[Int, Long], y: Map[Int, Long]): Double = {
        // drive the aggregator's finish against reference y with the
        // counts of x pre-loaded (psi is computed there)
        val nb = (x.keys ++ y.keys).max + 1
        val agg = new WindowDriftAggregator(0.0, 100.0, math.max(nb, 1), y)
        val buf = agg.zero
        x.foreach { case (bin, c) => buf(bin + 1) = c }
        agg.finish(buf).psi.get
      }
      assert(psi(a, a) == 0.0, s"self-drift must be exactly 0: $a")
      val (ab, ba) = (psi(a, b), psi(b, a))
      assert(math.abs(ab - ba) < 1e-12, s"psi symmetric: $ab vs $ba")
      assert(ab >= 0.0, s"psi non-negative: $ab for $a vs $b")
    }
  }
}
