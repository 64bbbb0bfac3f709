package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Properties of the near-dup family against in-memory reference
  * implementations: exact Jaccard pairs match a brute-force computation,
  * LSH candidates are a subset of the exact pairs (verification admits
  * no false positives), and connected components agree with union-find.
  * Corpora are scalacheck-generated from a tiny vocabulary so near-dups
  * genuinely occur; cases are few because each pays Spark jobs. */
class DedupPropertySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 6): Seq[A] = {
    val p = Gen.Parameters.default.withSize(10)
    Iterator.from(0)
      .map(i => gen.apply(p, Seed(7L + 1000L * i)))
      .collect { case Some(a) => a }
      .take(n).toSeq
  }

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(4, 9).flatMap(n => Gen.listOfN(n, docGen))

  private def df(docs: List[String]): DataFrame =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Reference shingle set — mirrors Dedup.shingles semantics. */
  private def shingleSet(text: String, k: Int = 3): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  private def refJaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    val inter = (sa & sb).size
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  test("property: TopBigramCount equals the brute-force bigram multiset max") {
    samples(corpusGen, n = 8).foreach { docs =>
      val expected = docs.zipWithIndex.map { case (t, i) =>
        val toks = t.split(" ").toSeq
        val top =
          if (toks.size < 2) 0L
          else toks.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(_.size).max.toLong
        i.toLong -> top
      }.toMap
      val got = graft.ops.TextAnalysis.repetitionStats(df(docs))
        .select("doc_id", "top_bigram_n").as[(Long, Long)].collect().toMap
      assert(got == expected, s"docs=$docs")
    }
  }

  test("property: jaccardPairs equals the brute-force pair set") {
    samples(corpusGen).foreach { docs =>
      val threshold = 0.3
      val expected = (for {
        i <- docs.indices; j <- docs.indices if i < j
        jac = refJaccard(docs(i), docs(j))
        if math.BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= threshold
      } yield (i.toLong, j.toLong)).toSet
      val got = Dedup.jaccardPairs(df(docs), threshold)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      withClue(s"docs=$docs: ") { assert(got == expected) }
    }
  }

  test("property: jaccardPairsChar equals the brute-force char-gram pair set") {
    def charSet(text: String, k: Int = 5): Set[String] = {
      val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
      if (t.length < k) Set(t) else t.sliding(k).toSet
    }
    samples(corpusGen).foreach { docs =>
      val threshold = 0.5
      val expected = (for {
        i <- docs.indices; j <- docs.indices if i < j
        (sa, sb) = (charSet(docs(i)), charSet(docs(j)))
        inter = (sa & sb).size
        jac = inter.toDouble / (sa.size + sb.size - inter).toDouble
        if math.BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= threshold
      } yield (i.toLong, j.toLong)).toSet
      val got = Dedup.jaccardPairsChar(df(docs), threshold)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      withClue(s"docs=$docs: ") { assert(got == expected) }
    }
  }

  test("property: minhash-LSH pairs are a subset of exact Jaccard pairs " +
    "and identical docs always pair") {
    samples(corpusGen).foreach { docs =>
      val threshold = 0.3
      val exact = (for {
        i <- docs.indices; j <- docs.indices if i < j
        if refJaccard(docs(i), docs(j)) >= threshold - 1e-9
      } yield (i.toLong, j.toLong)).toSet
      val lsh = Dedup.minhashLshPairs(df(docs), threshold)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      withClue(s"docs=$docs: ") {
        assert(lsh.subsetOf(exact)) // exact verification: no false positives
        val identical = (for {
          i <- docs.indices; j <- docs.indices
          if i < j && shingleSet(docs(i)) == shingleSet(docs(j))
        } yield (i.toLong, j.toLong)).toSet
        assert(identical.subsetOf(lsh)) // equal sigs collide in every band
      }
    }
  }

  test("property: incrementalMinhashPairs equals the full LSH run " +
    "restricted to pairs touching the batch") {
    samples(corpusGen, n = 5).foreach { docs =>
      val threshold = 0.3
      val all = df(docs)
      // deterministic ~1/3 slice plays the newly-ingested batch
      val batch = all.filter($"doc_id" % 3 === 0)
      val corpus = all.filter($"doc_id" % 3 =!= 0)
      val index = Dedup.minhashBandIndex(corpus)
      val inc = Dedup.incrementalMinhashPairs(batch, corpus, index, threshold)
        .as[(Long, Long, Double)].collect().toSet
      val fullRestricted = Dedup.minhashLshPairs(all, threshold)
        .as[(Long, Long, Double)].collect().toSet
        .filter(t => t._1 % 3 == 0 || t._2 % 3 == 0)
      withClue(s"docs=$docs: ") {
        // EQUALITY both ways, scores included: the incremental path
        // promises no recall loss relative to the full run it replaces
        assert(inc == fullRestricted)
      }
    }
  }

  test("property: incrementalMinhashPairs charGrams variant equals the " +
    "full char-gram LSH run restricted to the batch") {
    samples(corpusGen, n = 3).foreach { docs =>
      val threshold = 0.5
      val all = df(docs)
      val batch = all.filter($"doc_id" % 3 === 0)
      val corpus = all.filter($"doc_id" % 3 =!= 0)
      val index = Dedup.minhashBandIndex(corpus, k = 5, charGrams = true)
      val inc = Dedup.incrementalMinhashPairs(
        batch, corpus, index, threshold, k = 5, charGrams = true)
        .as[(Long, Long, Double)].collect().toSet
      val fullRestricted = Dedup.minhashLshPairsChar(all, threshold)
        .as[(Long, Long, Double)].collect().toSet
        .filter(t => t._1 % 3 == 0 || t._2 % 3 == 0)
      withClue(s"docs=$docs: ") { assert(inc == fullRestricted) }
    }
  }

  test("incrementalMinhashPairs never re-signs the corpus: with a " +
    "persisted index, every signer in the plan binds to the batch relation") {
    // batch and corpus as SEPARATE local relations so plan leaves are
    // attributable; the index is materialized like a real deployment's
    // persisted postings (a scan of 3 longs, no signer inside).
    val batch = df(List("alpha beta gamma delta")) // doc_id 0
    val corpus = List("alpha beta gamma delta", "eps zeta alpha beta",
      "gamma delta eps zeta").zipWithIndex
      .map { case (t, i) => (i + 1L, t) }.toDF("doc_id", "text")
    import scala.jdk.CollectionConverters._
    val live = Dedup.minhashBandIndex(corpus)
    val idx = spark.createDataFrame(live.collect().toSeq.asJava, live.schema)
    val persisted = Dedup.incrementalMinhashPairs(batch, corpus, idx, threshold = 0.3)
    // tree-walk, not a textual count: for every optimized-plan node whose
    // expressions contain the fused signer, ALL leaf relations under it
    // must be the 1-row batch relation — signing the corpus texts (3-row
    // leaf) or the index anywhere fails regardless of how many times the
    // optimizer textually duplicates the batch subtree.
    val plan = persisted.queryExecution.optimizedPlan
    val signerNodes = plan.collect {
      case node if node.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.WordGramMinHash])) => node
    }
    assert(signerNodes.nonEmpty, "expected the batch to be signed")
    signerNodes.foreach { node =>
      val leafSizes = node.collectLeaves().map {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          lr.data.size
        case other => fail(s"unexpected leaf under a signer: $other")
      }
      assert(leafSizes.forall(_ == 1),
        s"a signer node reaches a non-batch relation (leaf row counts " +
          s"$leafSizes):\n$node")
    }
    // and the persisted-index probe matches the live-index one, scores included
    assert(persisted.as[(Long, Long, Double)].collect().toSet ==
      Dedup.incrementalMinhashPairs(batch, corpus, live, threshold = 0.3)
        .as[(Long, Long, Double)].collect().toSet)
  }

  test("property: simhashPairs equals brute-force hamming pairs (4-band " +
    "blocking is lossless for distance <= 3)") {
    samples(corpusGen).foreach { docs =>
      // per-doc simhash computed through the same engine expression...
      val hashes = df(docs)
        .select($"doc_id", Dedup.simhash(Dedup.normalize($"text")).as("h"))
        .as[(Long, Long)].collect().toMap
      // ...then pairs brute-forced in memory
      val expected = (for {
        i <- docs.indices; j <- docs.indices if i < j
        d = java.lang.Long.bitCount(hashes(i.toLong) ^ hashes(j.toLong))
        if d <= 3
      } yield (i.toLong, j.toLong)).toSet
      val got = Dedup.simhashPairs(df(docs), maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      withClue(s"docs=$docs: ") { assert(got == expected) }
    }
  }

  test("property: removeDuplicateSpans equals the brute-force first-occurrence rule") {
    // small k over a tiny vocabulary so duplicate grams genuinely occur
    val k = 3
    samples(corpusGen, n = 6).foreach { docs =>
      // reference: occurrences of each gram ordered by (doc, pos); every
      // occurrence after the first covers its k tokens for removal
      val toks = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.trim.split("\\s+").toSeq
      }
      val occ = for {
        (id, ts) <- toks
        if ts.size >= k
        p <- 1 to (ts.size - k + 1)
      } yield (ts.slice(p - 1, p - 1 + k).mkString(" "), id, p)
      val firsts = occ.groupBy(_._1).view
        .mapValues(_.map { case (_, id, p) => (id, p) }.min).toMap
      val covered: Set[(Long, Int)] = occ.collect {
        case (g, id, p) if firsts(g) != ((id, p)) =>
          (p until p + k).map(id -> _)
      }.flatten.toSet
      val expected = toks.map { case (id, ts) =>
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !covered(id -> (i + 1)) => t
        }
        id -> ((ts.size, ts.size - kept.size, kept.mkString(" ")))
      }.toMap

      val out = Dedup.removeDuplicateSpans(df(docs), k = k).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      assert(out == expected, s"corpus: $docs")
    }
  }

  test("property: connectedComponents matches union-find") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
        .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) })
        .suchThat(_.nonEmpty)
    samples(edgesGen).foreach { edges =>
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      withClue(s"edges=$edges: ") {
        assert(got.keySet == expected.keySet)
        // same partition into components, labelled by the component min
        assert(got == expected.map { case (k, r) =>
          k -> expected.filter(_._2 == r).keys.min })
      }
    }
  }
}
