package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TrainingPrep

/** Unit coverage for the training-set preparation operators, checked
  * against in-memory reference computations that replicate the
  * arithmetic split/shard hash. */
class TrainingPrepSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Scala mirror of TrainingPrep.idHash / splitCol / shardCol
    * (reduced-first, overflow-free for all longs). */
  private def refHash(id: Long): Long =
    math.floorMod(math.floorMod(id, 1000003L) * 2654435761L, 1000003L)
  private def refSplit(id: Long, trainPct: Int = 90): String =
    if (refHash(id) % 100 < trainPct) "train" else "holdout"
  private def refShard(id: Long, shards: Int): Long =
    refHash(id) % shards

  test("packChunks: sharded concat-and-chunk layout matches a sequential fold") {
    val docs = (1L to 40L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = TrainingPrep.packChunks(docs, chunkTokens = 10, shards = 3)
      .select("doc_id", "shard", "n_tok", "start_tok", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // reference: per shard, docs in id order, running start offset
    val expected = (1L to 40L).map { i =>
      val nTok = (i % 7 + 1).toInt
      (i, refShard(i, 3), nTok)
    }.groupBy(_._2).flatMap { case (_, docs) =>
      docs.sortBy(_._1).scanLeft((0L, 0L, 0, 0L)) {
        case ((_, _, _, acc), (id, shard, n)) => (id, shard, n, acc + n)
      }.drop(1).map { case (id, shard, n, cum) =>
        val start = cum - n
        (id, shard, n, start, start / 10)
      }
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
    // layout is partitioning-independent
    val repart = TrainingPrep.packChunks(
      docs.repartition(7), chunkTokens = 10, shards = 3)
      .select("doc_id", "chunk").as[(Long, Long)].collect().sortBy(_._1)
    assert(repart.toSeq == expected.map(e => (e._1, e._5)))
  }

  test("splitContamination: holdout docs with train-side text dups are flagged") {
    // find one holdout and two train ids under the real hash, then give
    // them the same text (plus whitespace noise the normalizer removes)
    val ids = (1L to 200L)
    val holdoutId = ids.find(refSplit(_) == "holdout").get
    val trainIds = ids.filter(refSplit(_) == "train").take(2)
    val dupText = "Shared  Text"
    val docs = (ids.map { i =>
      val text = if (i == holdoutId || trainIds.contains(i)) dupText
        else s"unique text $i"
      (i, text)
    }).toDF("doc_id", "text")
    val out = TrainingPrep.splitContamination(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((holdoutId, 2L, trainIds.min)))
  }

  test("bloomDecontaminate: flags exactly the train docs matching a holdout norm " +
    "(Bloom prefilter invisible in the result, even at an absurd fpp)") {
    val ids = (1L to 300L)
    val holdoutIds = ids.filter(refSplit(_) == "holdout").take(2)
    val trainDups = ids.filter(refSplit(_) == "train").take(3)
    val dupText = "Shared  Benchmark   Text" // whitespace the normalizer folds
    val docs = ids.map { i =>
      val text = if (holdoutIds.contains(i) || trainDups.contains(i)) dupText
        else s"unique text $i"
      (i, text)
    }.toDF("doc_id", "text")
    val out = TrainingPrep.bloomDecontaminate(docs)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == trainDups.sorted.map(i => (i, 2L, holdoutIds.min)))
    // a near-useless Bloom filter (50% fpp) changes nothing: false
    // positives die in the exact join, false negatives cannot exist
    val sloppy = TrainingPrep.bloomDecontaminate(docs, fpp = 0.5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(sloppy == out)
    // no cross-split duplication -> empty
    val clean = ids.map(i => (i, s"unique text $i")).toDF("doc_id", "text")
    assert(TrainingPrep.bloomDecontaminate(clean).count() == 0)
    // an all-train corpus (EMPTY holdout side) must not crash building
    // the filter (stat.bloomFilter NPEs on an empty frame; we skip the prefilter)
    val allTrain = ids.filter(refSplit(_) == "train")
      .map(i => (i, s"t $i")).toDF("doc_id", "text")
    assert(TrainingPrep.bloomDecontaminate(allTrain).count() == 0)
  }

  test("clusterSafeSplit: a near-dup cluster lands whole in one split; " +
    "singletons split exactly as splitCol") {
    // ids chosen so a naive id-hash split WOULD separate the pair
    val ids = (1L to 200L)
    val a = ids.find(refSplit(_) == "train").get
    val b = ids.find(refSplit(_) == "holdout").get
    val docs = ids.map(i => (i, s"unique text $i")).toDF("doc_id", "text")
    val pairs = Seq((math.min(a, b), math.max(a, b))).toDF("id_a", "id_b")
    val out = TrainingPrep.clusterSafeSplit(docs, pairs)
      .select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // the pair collapses to one cluster (min id) and ONE split — the
    // leakage the operator exists to prevent
    val rep = math.min(a, b)
    assert(out(a) == (rep, refSplit(rep)) && out(b) == (rep, refSplit(rep)))
    assert(refSplit(a) != refSplit(b), "test ids must disagree under the id split")
    // everyone else: own cluster, plain id-hash split
    ids.filterNot(i => i == a || i == b).foreach { i =>
      assert(out(i) == (i, refSplit(i)))
    }
  }

  test("ngramContamination: shared k-gram spans flag holdout docs; unique docs don't") {
    val ids = (1L to 100L)
    val holdoutId = ids.find(refSplit(_) == "holdout").get
    val trainId = ids.find(refSplit(_) == "train").get
    val span = "alpha beta gamma delta epsilon" // the one shared 5-gram
    val docs = ids.map { i =>
      // diverge immediately after the span (and use per-doc-unique filler
      // tokens) so exactly ONE 5-gram is shared between holdout and train
      val text = if (i == holdoutId) s"$span h1 h2 h3 h4"
        else if (i == trainId) s"$span t1 t2 t3 t4"
        else s"f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f"
      (i, text)
    }.toDF("doc_id", "text")
    val out = TrainingPrep.ngramContamination(docs, k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // the holdout doc has 9 tokens -> 5 distinct 5-grams; exactly the
    // leading one ("alpha beta gamma delta epsilon") exists in train
    assert(out == Seq((holdoutId, 5L, 1L)))
  }

  test("stratifiedSample: exactly min(n, stratum) per stratum, partitioning-independent") {
    val docs = (1L to 90L).map(i => (i, if (i <= 60) "big" else "small", s"t$i"))
      .toDF("doc_id", "lang", "text")
    val out = TrainingPrep.stratifiedSample(docs, n = 25)
    val perStratum = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum == Map("big" -> 25L, "small" -> 25L))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    val idsRepart = TrainingPrep.stratifiedSample(docs.repartition(11), n = 25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == idsRepart)
    // undersized stratum: all rows survive
    val tiny = TrainingPrep.stratifiedSample(docs.filter($"lang" === "small"), n = 100)
    assert(tiny.count() == 30)
  }

  test("rebalanceMixture: scarcest weighted key keeps all; unweighted keys drop") {
    // 80 en / 40 de / 30 unweighted; weights 50/50 → target T = min(80/.5,
    // 40/.5) = 80 → en keeps 40/80 = 0.5, de keeps 40/40 = all
    val docs = (1L to 150L).map { i =>
      val k = if (i <= 80) "en" else if (i <= 120) "de" else "xx"
      (i, k, s"t$i")
    }.toDF("doc_id", "lang", "text")
    val out = TrainingPrep.rebalanceMixture(docs,
      weights = Map("en" -> 0.5, "de" -> 0.5))
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("de") == 40) // keep fraction 1.0 — every de doc survives
    assert(!byLang.contains("xx")) // weight 0 → dropped
    // en keeps ~half via the hash threshold (exact count is whatever the
    // hash yields — pinned deterministic below, bounded loosely here)
    assert(byLang("en") > 25 && byLang("en") < 55)
    val again = TrainingPrep.rebalanceMixture(docs.repartition(13),
      weights = Map("en" -> 0.5, "de" -> 0.5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.map(_._1).sorted.toSeq)
  }

  test("property: contamination operators equal brute-force references on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new scala.util.Random(23)
    def wordGrams(text: String, k: Int): Set[String] = {
      val toks = text.split(" ").toSeq
      if (toks.size < k) Set(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    (0 until 5).foreach { _ =>
      // duplicated texts occur often with a tiny vocab and short docs
      val docs = (1L to (20 + rnd.nextInt(20))).map { i =>
        (i, (0 until 2 + rnd.nextInt(5)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val split = docs.map { case (id, _) => id -> refSplit(id) }.toMap
      // exact contamination reference
      val byText = docs.groupBy(_._2)
      val expectedExact = (for {
        (_, group) <- byText
        trainIds = group.collect { case (id, _) if split(id) == "train" => id }
        if trainIds.nonEmpty
        (id, _) <- group if split(id) == "holdout"
      } yield (id, trainIds.size.toLong, trainIds.min)).toSet
      val gotExact = TrainingPrep.splitContamination(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long)].collect().toSet
      withClue(s"exact, docs=$docs: ") { assert(gotExact == expectedExact) }
      // n-gram contamination reference (k=3 so grams repeat)
      val grams = docs.map { case (id, t) => id -> wordGrams(t, 3) }.toMap
      val trainGrams = docs.collect {
        case (id, _) if split(id) == "train" => grams(id)
      }.foldLeft(Set.empty[String])(_ ++ _)
      val expectedNg = (for {
        (id, _) <- docs if split(id) == "holdout"
        hit = grams(id).count(trainGrams.contains)
        if hit > 0
      } yield (id, grams(id).size.toLong, hit.toLong)).toSet
      val gotNg = TrainingPrep.ngramContamination(docs.toDF("doc_id", "text"), k = 3)
        .as[(Long, Long, Long)].collect().toSet
      withClue(s"ngram, docs=$docs: ") { assert(gotNg == expectedNg) }
    }
  }

  test("idHash: overflow-free and congruent to the naive hash for ids beyond 2^32") {
    // ids where id * 2654435761 overflows signed 64-bit: the naive hash
    // wraps negative and would classify everything 'train' / shard <= 0;
    // the reduced-first form stays in [0, 1000003) for every long
    val ids = Seq(1L, 42L, 3470000000L, 1L << 33, 1L << 40, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select($"doc_id", TrainingPrep.idHash($"doc_id").as("h"),
        TrainingPrep.splitCol($"doc_id").as("split"),
        TrainingPrep.shardCol($"doc_id", 64).as("shard"))
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    got.foreach { case (id, h, split, shard) =>
      assert(h >= 0 && h < 1000003L, s"id=$id hash out of range: $h")
      assert(h == refHash(id), s"id=$id hash mismatch")
      assert(split == refSplit(id) && shard == refShard(id, 64))
    }
    // both split classes occur among the overflow-range ids (2^33 hashes
    // holdout, 3470000000 train) — the naive overflow bug collapsed every
    // overflowing id to 'train'
    assert(got.filter(_._1 > 3000000000L).map(_._3).toSet == Set("train", "holdout"))
  }

  test("idHash: a negative id raises instead of silently diverging from " +
    "truncated-remainder oracles") {
    val e = intercept[Exception] {
      Seq(5L, -3L).toDF("doc_id")
        .select(TrainingPrep.idHash($"doc_id")).collect()
    }
    // Spark wraps the raise_error in a SparkRuntimeException whose
    // message carries our text
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("tokenBudgetSample: kept set is the budget-bounded prefix in (shard, hash, id) order") {
    val docs = (1L to 60L).map { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "books"
      (i, src, ("w " * (i % 9 + 1).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val budgets = Map("web" -> 40L, "code" -> 25L) // "books" unbudgeted → dropped
    val out = TrainingPrep.tokenBudgetSample(docs, budgets, shards = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    // reference: per source, docs ordered by (shard, hash, id); keep the
    // longest prefix whose inclusive cumsum fits the budget
    val ref = (1L to 60L).map { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "books"
      (i, src, (i % 9 + 1))
    }.groupBy(_._2).flatMap { case (src, rows) =>
      budgets.get(src).toSeq.flatMap { budget =>
        var cum = 0L
        rows.sortBy { case (id, _, _) => (refShard(id, 4), refHash(id), id) }
          .flatMap { case (id, s, n) =>
            cum += n
            if (cum <= budget) Some((id, s, n.toLong, cum)) else None
          }
      }
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == ref)
    // per-group totals respect the budgets
    val totals = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    totals.foreach { case (src, t) => assert(t <= budgets(src)) }
    // and the result is partitioning-independent
    val out2 = TrainingPrep.tokenBudgetSample(docs.repartition(7), budgets, shards = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out2.toSeq == out.toSeq)
  }

  test("chunkDocuments: overlapping chunks cover every token, last chunk reaches the end") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks → 3 chunks at 4/1
      (2L, "a b c"),                           // fits whole → 1 chunk
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"))     // 9 toks → short tail chunk
      .toDF("doc_id", "text")
    val out = TrainingPrep.chunkDocuments(df, chunkTokens = 4, overlapTokens = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 4, "t4 t5 t6 t7"),
      (1L, 2, 4, "t7 t8 t9 t10"),
      (2L, 0, 3, "a b c"),
      (3L, 0, 4, "x1 x2 x3 x4"),
      (3L, 1, 4, "x4 x5 x6 x7"),
      (3L, 2, 3, "x7 x8 x9")))
    intercept[IllegalArgumentException] {
      TrainingPrep.chunkDocuments(df, chunkTokens = 4, overlapTokens = 4)
    }
  }

  test("property: chunkDocuments tokenization agrees with tokenCount " +
    "(same tokenizer, odd whitespace included)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 30L).map { i =>
      // deliberately hostile whitespace: double spaces, leading/trailing
      val sep = () => if (rnd.nextInt(4) == 0) "  " else " "
      val body = (0 until 1 + rnd.nextInt(12))
        .map(j => s"w${rnd.nextInt(9)}$j").reduceLeft(_ + sep() + _)
      (i, if (rnd.nextBoolean()) s" $body" else body)
    }
    val df = docs.toDF("doc_id", "text")
    val chunkTokens = 5; val overlap = 2; val stride = chunkTokens - overlap
    val chunks = TrainingPrep.chunkDocuments(df,
        chunkTokens = chunkTokens, overlapTokens = overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    val counts = df.select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")))
      .as[(Long, Int)].collect().toMap
    docs.foreach { case (id, _) =>
      val cs = chunks(id).sortBy(_._2)
      val n = counts(id)
      // every chunk's token count follows the coverage formula off the
      // SAME token definition tokenCount uses...
      cs.foreach { case (_, no, nTok, _) =>
        assert(nTok == math.min(chunkTokens, n - no * stride),
          s"doc $id chunk $no: n_tokens $nTok vs tokenCount $n")
      }
      // ...and the last chunk reaches exactly the last token
      val (_, lastNo, lastTok, _) = cs.last
      assert(lastNo * stride + lastTok == n,
        s"doc $id: chunks cover ${lastNo * stride + lastTok} of $n tokens")
    }
  }

  test("training-prep operators are empty-input safe") {
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TrainingPrep.packChunks(noDocs).count() == 0)
    assert(TrainingPrep.splitContamination(noDocs).count() == 0)
    assert(TrainingPrep.ngramContamination(noDocs).count() == 0)
    assert(TrainingPrep.tfidfTopTerms(noDocs, corpusN = 0).count() == 0)
    assert(TrainingPrep.stratifiedSample(noDocs, n = 5).count() == 0)
    assert(TrainingPrep.rebalanceMixture(noDocs, Map("en" -> 1.0)).count() == 0)
  }

  test("property: tfidfTopTerms equals a brute-force reference on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { _ =>
      val docs = (1L to (4 + rnd.nextInt(5))).map { i =>
        (i, (0 until 3 + rnd.nextInt(7)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val n = docs.size.toLong
      // brute-force reference with the operator's exact rounding/order
      val tf = docs.flatMap { case (id, t) =>
        t.split(" ").groupBy(identity).map { case (term, occ) => (id, term, occ.length) }
      }
      val dfc = tf.groupBy(_._2).view.mapValues(_.size).toMap
      val expected = tf.groupBy(_._1).flatMap { case (id, rows) =>
        rows.map { case (_, term, f) =>
          val score = BigDecimal(f * math.log(n.toDouble / dfc(term)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, term, score)
        }.sortBy { case (_, term, score) => (-score, term) }
          .take(3).zipWithIndex
          .map { case ((i2, term, score), r) => (i2, r + 1, term, score) }
      }.toSet
      val got = TrainingPrep.tfidfTopTerms(docs.toDF("doc_id", "text"), corpusN = n)
        .as[(Long, Int, String, Double)].collect().toSet
      withClue(s"docs=$docs: ") { assert(got == expected) }
    }
  }

  test("tfidfTopTerms: ubiquitous terms score zero; rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common rare2 other")).toDF("doc_id", "text")
    val out = TrainingPrep.tfidfTopTerms(docs, corpusN = 3, topK = 2)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // df(common)=3 -> ln(1)=0 exactly; rare terms: ln(3)≈1.0986
    assert(out(1L) == Seq(("rare1", 1.0986), ("common", 0.0)))
    assert(out(2L) == Seq(("rare2", 0.4055), ("common", 0.0)))
    assert(out(3L).head._1 == "other" || out(3L).head._1 == "rare2")
    // rare2 (df=2) and other (df=1): other scores ln(3), rare2 ln(1.5)
    assert(out(3L) == Seq(("other", 1.0986), ("rare2", 0.4055)))
  }

  test("qualityQuantileGate: exact cutoffs match a brute-force quantile, " +
    "the gate keeps exactly the at-or-above rows, and the plan is window-free") {
    // two groups with known 0.5-quantiles: a=[10,20,30,40] -> 25.0
    // (interpolated), b=[5,15,25] -> 15.0 (exact middle)
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 5L), (6L, "b", 15L), (7L, "b", 25L))
      .toDF("doc_id", "grp", "score")
    val out = graft.ops.TrainingPrep.qualityQuantileGate(
      rows, "score", 0.5, Seq("grp"), exact = true)
    val got = out.select("doc_id", "q_cutoff")
      .as[(Long, Double)].collect().toMap
    // survivors: a's 30,40 (>= 25.000001) and b's 15,25 (>= 15.000001?
    // no — the epsilon nudges the cutoff ABOVE an exact-integer quantile,
    // so 15 itself survives only via the rounding: 15 + 1e-6 rounds to
    // 15.0 at 4 decimals? round(15.000001, 4) = 15.0 -> 15 >= 15.0 keeps)
    assert(got.keySet == Set(3L, 4L, 6L, 7L), s"got ${got.keySet}")
    assert(got(3L) == 25.0 && got(6L) == 15.0)
    // window-free: the gate is an aggregate + join + filter, never a
    // percent_rank over the group partition
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "qualityQuantileGate must not plan a window")
    // approx mode at full accuracy agrees on this tiny input
    val approx = graft.ops.TrainingPrep.qualityQuantileGate(
      rows, "score", 0.5, Seq("grp"))
      .select("doc_id").as[Long].collect().toSet
    assert(approx.subsetOf(Set(2L, 3L, 4L, 6L, 7L)) && approx.size >= 3)
  }

  test("qualityQuantileGate: rows with a NULL group key form their own " +
    "source group (gated against their own cutoff, never dropped)") {
    // null group = [10,20,30,40] -> 0.5-quantile 25.0; "en" = [5,15,25]
    // -> 15.0. A null-unsafe equi-join would silently discard all four
    // null-lang rows (the r11 ADVICE finding); SQL GROUP BY — and
    // DuckDB — treat NULL as one group, so they must gate normally.
    val rows = Seq(
      (1L, null, 10L), (2L, null, 20L), (3L, null, 30L), (4L, null, 40L),
      (5L, "en", 5L), (6L, "en", 15L), (7L, "en", 25L))
      .toDF("doc_id", "lang", "score")
    val out = graft.ops.TrainingPrep.qualityQuantileGate(
      rows, "score", 0.5, Seq("lang"), exact = true)
    val got = out.select("doc_id", "q_cutoff")
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(3L, 4L, 6L, 7L), s"got ${got.keySet}")
    assert(got(3L) == 25.0 && got(6L) == 15.0)
    // output schema is unchanged by the null-safe join plumbing
    assert(out.columns.toSeq == Seq("doc_id", "lang", "score", "q_cutoff"))
  }
}
