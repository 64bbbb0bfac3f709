package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopKAggregator}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (SURVEY §2 Layer C):
  *   - `bruteForceTopK` — exact: broadcast the (small) query set, scan the
  *     corpus once, partial-aggregate a per-query top-k with a typed
  *     Aggregator. The corpus is never shuffled: the only exchange carries
  *     k×|queries| rows. This is the right exact plan at 100 TB whenever
  *     the query set fits in a broadcast.
  *   - `lshTopK` — approximate: deterministic random-hyperplane LSH.
  *     Corpus and queries are bucketed by an H-bit signature per table
  *     (L tables for recall); candidates are equi-joined on
  *     (table, signature) — bounded fan-out, no cross join — then scored
  *     exactly and top-k'd. The scale path when queries don't fit in a
  *     broadcast or the corpus×queries product is too big.
  *
  * All scoring is cosine in double precision via higher-order functions —
  * whole-stage-codegen'd, no UDF in the scan path.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Dot products are the codegen'd [[graft.functions.VecDot]] native
    * expression (a primitive for-loop inside whole-stage codegen) rather
    * than interpreted `zip_with`+`aggregate` HOFs; summation order is the
    * same sequential left-fold, so values are bit-identical. */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.VecDot.dot _
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbours for every vector in `queries` against
    * `corpus`, excluding self-matches on id. Output:
    * (query_id, cand_id, cos, rank) with cos rounded to 4 d.p. and rank
    * dense from 1 with (cos DESC, cand_id ASC) ordering. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = Dedup.widen(corpus).select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c
      .join(q, col("query_id") =!= col("cand_id")) // broadcast NLJ: corpus scanned once
      .select(
        col("query_id"),
        round(cosine(col("qv"), col("cv")), 4).as("score"),
        col("cand_id").as("id"))
    // partial-aggregated top-k: k rows per (partition, query) cross the wire
    val agg = new TopKAggregator(k).toColumn
    scored
      .as[(Long, Double, Long)]
      .map { case (qid, s, id) => (qid, ScoredId(s, id)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case (si, i) =>
          (qid, si.id, si.score, i + 1)
        }
      }
      .toDF("query_id", "cand_id", "cos", "rank")
  }

  /** Deterministic random hyperplanes: L tables × H planes × dim weights,
    * seeded once — identical on every run and every executor. */
  private[ops] def planes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(bits >= 1 && bits <= 64,
      s"signature bits must be in 1..64, got $bits — 1L << i wraps mod 64, " +
        "so higher bit counts would silently collide planes")
    val rnd = new Random(42)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** H-bit signature of a vector column under one table's planes. Each
    * plane ships as ONE array literal (`typedLit`), not `dim` scalar
    * literal nodes — per-double literals once ballooned the serialized
    * task binaries past 1 MiB. */
  private def signature(vec: Column, tablePlanes: Array[Array[Double]]): Column = {
    val bits = tablePlanes.zipWithIndex.map { case (p, i) =>
      val d = graft.functions.VecDot.dot(vec, typedLit(p.toSeq))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact embedding near-dup pairs: every (id_a < id_b) pair with
    * cosine >= threshold. O(n²) by definition — correct only when one
    * side fits in a broadcast (the corpus is scanned once against it).
    * At 100 TB use [[cosineDupPairsLsh]]; this is the oracle-checkable
    * exact form and the right plan for corpora up to broadcast size. */
  def cosineDupPairs(
      df: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dot = graft.functions.VecDot.dot _
    // norms are precomputed per ROW (n of them), not per PAIR (n²): the
    // divisor is the same value bit-for-bit, only hoisted
    val a = Dedup.widen(df)
      .select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val b = broadcast(df
      .select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dot(col("vb"), col("vb")))))
    a.join(b, col("id_a") < col("id_b")) // broadcast NLJ: corpus scanned once
      .withColumn("cos",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact cosine pairs with AT LEAST ONE endpoint in a deterministic
    * idHash probe slice (`xxhash64(id) % probeDenom == 0`) — the
    * scale-bounded ground truth for the embedding recall gate (q85),
    * mirroring [[graft.ops.Dedup.jaccardProbePairs]]: a fixed-size probe
    * slice keeps the expected pair count scale-invariant (pairs grow
    * linearly with the corpus, so a two-sided sample thins them
    * quadratically), and the probe side broadcasts so the corpus is
    * scanned ONCE — O(probes · n) instead of [[cosineDupPairs]]'s
    * O(n²). `probeDenom = 1` reproduces [[cosineDupPairs]] exactly
    * (pinned in SketchRecallSpec). */
  def cosineProbePairs(
      df: DataFrame,
      threshold: Double,
      probeDenom: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(probeDenom >= 1, s"probeDenom must be >= 1, got $probeDenom")
    val dot = graft.functions.VecDot.dot _
    val c = Dedup.widen(df)
      .select(col(idCol).as("id_c"), col(vecCol).as("vc"))
      .withColumn("nc", sqrt(dot(col("vc"), col("vc"))))
    val p = broadcast(df
      .filter(pmod(xxhash64(col(idCol)), lit(probeDenom)) === 0)
      .select(col(idCol).as("id_p"), col(vecCol).as("vp"))
      .withColumn("np", sqrt(dot(col("vp"), col("vp")))))
    c.join(p, col("id_p") =!= col("id_c") &&
        // unordered pair once: probe-probe pairs keep id_p < id_c
        (pmod(xxhash64(col("id_c")), lit(probeDenom)) =!= 0 ||
          col("id_p") < col("id_c")))
      .withColumn("cos",
        round(dot(col("vp"), col("vc")) / (col("np") * col("nc")), 4))
      .filter(col("cos") >= threshold)
      .select(least(col("id_p"), col("id_c")).as("id_a"),
        greatest(col("id_p"), col("id_c")).as("id_b"), col("cos"))
  }

  /** Embedding near-dup pairs at scale: LSH-bucket the corpus (L tables
    * of H-bit hyperplane signatures), generate candidate pairs per
    * bucket by grouped explode (bounded by the bucket-size cap, never a
    * self-join), then verify with exact cosine. Probabilistic recall —
    * the standard web-scale tradeoff; precision is exact. */
  def cosineDupPairsLsh(
      df: DataFrame,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Int = 10000): DataFrame = {
    val bucketed = lshBucketIndex(df, tables, bits, dim, idCol, vecCol)
    val cand = Dedup.bucketPairs(
      bucketed.withColumn("isb", lit(0L)),
      requireFlagged = false, cap = maxBucket)
    verifyCosinePairs(cand,
      Dedup.widen(df).select(col(idCol).as("id"), col(vecCol).as("p")),
      threshold)
  }

  /** Persistable cosine-LSH bucket index: `(id, band, bucket)` — band is
    * the hyperplane table, bucket its sign signature; the exact postings
    * [[cosineDupPairsLsh]] derives internally, exposed so they can be
    * stored once and probed per ingest by [[incrementalCosineDupPairs]].
    * Same persistence contract as [[graft.ops.Dedup.minhashBandIndex]]:
    * (tables, bits, dim) are the index's identity; append a batch's rows
    * after it is accepted; deletes remove the id's rows. ~3 longs ×
    * tables per vector — a sliver of the embedding bytes. */
  def lshBucketIndex(
      df: DataFrame,
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ps = planes(tables, bits, dim)
    val sigs = (0 until tables).map { t =>
      struct(lit(t).as("band"), signature(col(vecCol), ps(t)).as("bucket"))
    }
    // outer generate — see Dedup.jaccardPairs for why plain explode
    // would re-run the signature computation below the widen exchange.
    // Only (id, band, bucket) enters the bucket grouping: shipping the
    // vectors through every bucket would multiply the shuffle payload by
    // `tables`, and an over-full bucket would assemble them all in one
    // buffer. Ids are collected with a bounded CappedCollect; vectors
    // re-join once, post-dedup, for exact verification.
    // NULL vectors sign to NOTHING (like a null text under
    // minhashBandIndex) — without the explicit filter the signature's
    // when/otherwise folds every null dot product to bit 0 and all null
    // vectors pile into bucket 0, bloating its candidate lists with ids
    // that can never verify (their cosine is null).
    Dedup.widen(df)
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"),
        explode_outer(array(sigs: _*)).as("b"))
      .filter(col("b").isNotNull)
      .select(col("id"), col("b.band"), col("b.bucket"))
  }

  /** Exact-cosine verification of candidate pairs via the shared
    * candidate-rehydration helpers (Dedup.restrictToCandidates /
    * rehydratePairs): vectors ship only for candidate ids, and each
    * pair's payloads join once. */
  private def verifyCosinePairs(
      cand: DataFrame, vecs: DataFrame, threshold: Double,
      groupedRehydrate: Boolean = false): DataFrame =
    Dedup.rehydratePairs(cand, Dedup.restrictToCandidates(vecs, cand),
      groupedRehydrate)
      .withColumn("cos", round(cosine(col("p_a"), col("p_b")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")

  /** Embedding near-dup pairs an ingested `batch` forms with the corpus
    * AND within itself, WITHOUT re-signing the corpus — the embedding
    * twin of [[graft.ops.Dedup.incrementalMinhashPairs]], same slice
    * construction: the batch is signed, the persisted `index` is
    * semi-joined to the batch's touched (band, bucket) keys (probe side
    * AQE-broadcasts; the index is scanned columnar, never shuffled), and
    * the full candidate+verification machinery runs on that slice. The
    * result equals `cosineDupPairsLsh(corpus ∪ batch, ...)` restricted
    * to pairs with at least one batch side, bucket caps included
    * (property-pinned). `corpus` supplies partner vectors for the exact
    * verification, semi-joined to candidate ids before shipping; `index`
    * must be the PRE-ingest index built with identical parameters. */
  def incrementalCosineDupPairs(
      batch: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Int = 10000): DataFrame = {
    val batchBucketed = lshBucketIndex(batch, tables, bits, dim, idCol, vecCol)
    val cand = Dedup.incrementalCandidates(batchBucketed, index, cap = maxBucket)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("p"))
      .unionByName(batch.select(col(idCol).as("id"), col(vecCol).as("p")))
    // grouped rehydration: slice-bounded incremental candidates (see
    // Dedup.rehydratePairs) — the pair exchange is small by construction
    verifyCosinePairs(cand, vecs, threshold, groupedRehydrate = true)
  }

  /** Approximate top-k via LSH bucketing: join on (table, signature),
    * exact-score candidates, keep per-query top-k. Recall grows with
    * `tables`; bucket size shrinks with `bits`.
    *
    * Choosing `bits` IS choosing a similarity regime: a pair at cosine
    * c collides in one table with probability (1 − arccos(c)/π)^bits.
    * Top-k neighbours typically sit at MID cosine (~0.4–0.6), where a
    * near-dup-tuned 12-bit signature collides at well under 1% per
    * table — measured recall 0.06 on the battery corpus, i.e. the
    * index silently misses almost everything while every precision
    * audit stays green (q85 pins the recall floor precisely because of
    * this failure mode). The 4-bit default collides at ~15–25% per
    * table there (recall ≈ 0.75+ over 8 tables) at the price of fat
    * buckets: 2^4 buckets per table means candidate volume grows as
    * ~corpus/2 — acceptable for moderate corpora, but at 100 TB prefer
    * [[ivfTopK]], whose cell count (and thus selectivity) grows with
    * the corpus while sign-LSH bucket counts stay fixed.
    *
    * Shuffle discipline (same shape as [[cosineDupPairsLsh]]): ONLY
    * `(id, table, sig)` rides the band exchange — a vector attached here
    * would cross the wire once per table (×8 the embedding table). The
    * deduped `(query_id, cand_id)` candidate list rehydrates each side's
    * vector exactly once, so a pair costs one vector shipment no matter
    * how many tables it collided in. Pinned by PlanSpec ("q49: no array
    * payload below the band exchange"). */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      tables: Int = 8,
      bits: Int = 4,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ps = planes(tables, bits, dim)
    def bucketedIds(df: DataFrame, id: String): DataFrame = {
      val sigs = (0 until tables).map { t =>
        struct(lit(t).as("table"), signature(col(vecCol), ps(t)).as("sig"))
      }
      // outer generate + widen: plain explode would make Catalyst infer a
      // size>0 filter that re-evaluates the whole tables×bits×dim
      // signature array a second time at the (possibly unsplittable)
      // scan — see Dedup.jaccardPairs for the full pathology.
      Dedup.widen(df)
        .select(col(idCol).as(id), explode_outer(array(sigs: _*)).as("b"))
        .filter(col("b").isNotNull)
        .select(col(id), col("b.table"), col("b.sig"))
    }
    val qb = bucketedIds(queries, "query_id")
    val cb = bucketedIds(corpus, "cand_id")
    // cap corpus bucket sizes like every sibling LSH path: a degenerate
    // signature bucket would otherwise fan out |q_bucket|×|c_bucket| rows
    // unbounded (an over-full bucket means the signature carries no
    // discriminating signal there anyway)
    val okBuckets = cb.groupBy("table", "sig").count()
      .filter(col("count") <= 10000).select("table", "sig")
    val cbCapped = cb.join(okBuckets, Seq("table", "sig"), "left_semi")
    val cand = qb.join(cbCapped, Seq("table", "sig"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .dropDuplicates("query_id", "cand_id")
    // rehydrate post-dedup — no broadcast hint on either side: the
    // candidate id set is NOT bounded by per-bucket caps (it's a union
    // across buckets), so AQE decides at runtime — broadcast when small,
    // shuffled join when not.
    val qVecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cVecs = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    cand
      .join(cVecs, "cand_id")
      .join(qVecs, "query_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  // ------------------------------------------------------------------ IVF

  /** dot(vec, literal weights) — one array literal, codegen'd VecDot. */
  private def dotLit(v: Column, w: Array[Double]): Column =
    graft.functions.VecDot.dot(v, typedLit(w.toSeq))

  private def normalized(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Cell assignment / probing against the trained centroids. Ranking by
    * dot against unit-norm centroids == ranking by cosine (the vector's
    * own norm is a common factor); ties break on the lower cell id. The
    * centroid matrix rides a BROADCAST, not expression-tree literals —
    * see [[graft.functions.CentroidOps]] for why (task-binary size:
    * nlist × dim doubles per literal copy). */
  private def cellsTop(
      v: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      k: Int): Column =
    graft.functions.CentroidOps.nearestCells(v, bc, k)

  /** One spherical Lloyd round over `train`'s `cv` column: assign each
    * sample to its nearest centroid, return the per-cell decimal means
    * re-normalized (empty cells keep their old centroid). The mean goes
    * through DECIMAL like every order-sensitive sum in the battery: a
    * double avg() sums in shuffle-arrival order, so a centroid coordinate
    * could differ by ulps between runs and flip near-tied cell
    * assignments — breaking the documented determinism. Shared by
    * [[ivfTopK]] and [[ivfPqTopK]]'s coarse quantizer. */
  private def lloydRound(
      train: DataFrame, cents: Array[Array[Double]]): Array[Array[Double]] = {
    val bc = train.sparkSession.sparkContext.broadcast(cents)
    val means = train
      .withColumn("cell", element_at(cellsTop(col("cv"), bc, 1), 1))
      .select(col("cell"), posexplode(col("cv")))
      .groupBy("cell", "pos")
      .agg(avg(col("col").cast("decimal(28,10)")).as("m"))
      .collect()
    bc.unpersist(blocking = false) // this round's block; next round rebroadcasts
    val next = cents.map(_.clone())
    means.foreach(r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue())
    next.map(normalized)
  }

  /** IVF (inverted-file) approximate top-k: k-means the corpus into
    * `nlist` Voronoi cells (spherical — unit-norm centroids, cosine
    * assignment), then score each query against only its `nprobe`
    * nearest cells' posting lists.
    *
    * Scale design: the coarse quantizer (nlist × dim doubles) is tiny BY
    * CONSTRUCTION — only per-cell dimension means ever reach the driver
    * (nlist·dim rows per Lloyd round, from a distributed partial-agg
    * groupBy); the corpus itself is never collected, shuffled once per
    * round for the mean and once at the end for cell assignment. Probing
    * reads ~nprobe/nlist of the corpus per query — the fraction a 100 TB
    * deployment tunes with nlist. Deterministic: seeded init (lowest ids),
    * fixed iteration count, sequential HOF folds, ties on cell id.
    *
    * The quantizer TRAINS on a bounded sample (~`trainPerCell` vectors
    * per centroid, selected by a deterministic id-hash so the subset is
    * partition-layout-independent): k-means quality needs only a few
    * hundred points per cell, so at 100 TB the Lloyd rounds touch a
    * fixed-size slice instead of scanning the corpus `iters` times; the
    * full corpus is read once, for the final cell assignment.
    *
    * Driver round-trip bound: training is `iters` SEQUENTIAL jobs (each
    * Lloyd round depends on the previous round's centroids — no
    * single-job formulation exists), and each round's collect is the
    * per-cell dimension means only: ≤ nlist × dim rows ≤ 4096 × dim.
    * At dim 64 that is ≤ ~262k decimal scalars (a few MB) per round ×
    * `iters` (default 3) — constant in the corpus size, so the driver
    * serialization cost does NOT grow at 100 TB; the levers that do
    * grow (sample scan, assignment scan, probe join) are all
    * distributed. Raising `nlist` past 4096 or dim past ~1k is where
    * this collect would start to matter; at that point switch the mean
    * to a treeAggregate of dense vectors (same jobs, smaller rows).
    *
    * @param nlist number of Voronoi cells; <= 0 (the default) derives
    *   ~sqrt(corpus) clamped to [16, 4096]. This is the standard IVF
    *   sizing AND a shuffle-width guard: the probe stage joins on `cell`,
    *   so nlist IS the reducer count of that exchange — a fixed small
    *   nlist at 100 TB would funnel the corpus through a handful of
    *   reducers, while sqrt(n) keeps both cell occupancy (~sqrt n) and
    *   join parallelism growing with the corpus. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 0,
      nprobe: Int = 4,
      iters: Int = 3,
      trainPerCell: Int = 256,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // the count also sizes the bounded training sample below (cheap:
    // parquet footer metadata on `corpus`, not the widened projection)
    val corpusN = corpus.count()
    val nl =
      if (nlist > 0) nlist
      else math.max(16, math.min(4096,
        math.ceil(math.sqrt(corpusN.toDouble)).toInt))
    val c = Dedup.widen(corpus)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    // deterministic init: the nlist lowest-id vectors, unit-normalized.
    // getSeq[Number]: the embedding column may be array<float> OR
    // array<double> (VecDot/cosine accept both), so read boxed numerics
    var cents: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(nl)
      .collect()
      .map(r => normalized(r.getSeq[Number](1).map(_.doubleValue()).toArray))
    require(cents.nonEmpty, "ivfTopK: corpus is empty — nothing to index")
    // bounded, deterministic training sample: keep ids whose hash falls in
    // 1/denom of the space; the id-hash filter (unlike df.sample) picks
    // the same subset regardless of partition count or row order, so
    // centroids are reproducible.
    val denom = math.max(1L, corpusN / (nl.toLong * trainPerCell))
    val train =
      if (denom <= 1L) c
      else c.filter(pmod(xxhash64(col("cand_id")), lit(denom)) === 0)
    var it = 0
    while (it < iters) {
      cents = lloydRound(train, cents)
      it += 1
    }
    val bcC = corpus.sparkSession.sparkContext.broadcast(cents)
    val assigned = c.withColumn("cell",
      element_at(cellsTop(col("cv"), bcC, 1), 1))
    val probes = Dedup.widen(queries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode_outer(cellsTop(col("qv"), bcC, nprobe)).as("cell"))
      .filter(col("cell").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    probes.join(assigned, "cell") // each corpus vec lives in exactly 1 cell: no dup pairs
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  // --------------------------------------------------------------- IVF-PQ
  // (PQ encoding/argmin lives in graft.functions.CentroidOps — the
  // codebooks ride broadcasts, not expression literals)

  /** IVF-PQ approximate top-k: the IVF coarse index of [[ivfTopK]] plus
    * product quantization of the residual scan — the classic
    * billion-scale ANN layout (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", IEEE TPAMI 2011).
    *
    * The corpus rides the probe join as `(cand_id, cell, norm, codes)`
    * where `codes` is `m` small ints (one codebook entry per `dim/m`-wide
    * subspace) — ~`m` bytes of payload instead of `dim` floats, the
    * compression that lets a 100 TB corpus's index fit in cluster memory.
    * Scoring is asymmetric-distance (ADC): each query precomputes one
    * `m × ksub` lookup table of subvector dots, so a candidate's
    * approximate dot is `m` table lookups — no vector arithmetic in the
    * scan. The top `rerank` ADC candidates per query rehydrate their true
    * vectors ONCE for exact cosine re-ranking, so reported scores are
    * exact (annAudit's score leg holds) and ADC error only costs recall,
    * bounded by `rerank ≫ k`.
    *
    * Training mirrors [[ivfTopK]]'s determinism contract: lowest-id
    * init, id-hash-bounded sample, decimal means, fixed `iters`, ties on
    * code id. Driver round-trips are `iters` collects of
    * `m × ksub × dsub = dim × ksub` decimal scalars (≤ 64·256 at the
    * defaults — constant in the corpus size), same bound class as the
    * coarse loop's `nlist × dim`.
    *
    * @param m      subspace count (must divide the embedding dim)
    * @param ksub   codebook entries per subspace (≤ 256 keeps a code one
    *               byte in a real serialized layout)
    * @param rerank ADC candidates per query that get exact re-scoring */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 0,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 64,
      iters: Int = 3,
      trainPerCell: Int = 256,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && ksub >= 2 && ksub <= 256, s"bad PQ shape m=$m ksub=$ksub")
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val corpusN = corpus.count()
    val nl =
      if (nlist > 0) nlist
      else math.max(16, math.min(4096,
        math.ceil(math.sqrt(corpusN.toDouble)).toInt))
    val c = Dedup.widen(corpus)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    // deterministic init for BOTH quantizers: the lowest-id vectors
    val initRows = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(math.max(nl, ksub)).collect()
      .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(initRows.nonEmpty, "ivfPqTopK: corpus is empty — nothing to index")
    val dim = initRows.head.length
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    var cents: Array[Array[Double]] =
      Array.tabulate(math.min(nl, initRows.length))(i => normalized(initRows(i)))
    // duplicate wrap-around entries when the corpus is tiny: argmin
    // tie-breaks to the lowest code, so duplicates are inert
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (j, kk) =>
      initRows(kk % initRows.length).slice(j * dsub, (j + 1) * dsub)
    }
    val denom = math.max(1L, corpusN / (nl.toLong * trainPerCell))
    val train =
      if (denom <= 1L) c
      else c.filter(pmod(xxhash64(col("cand_id")), lit(denom)) === 0)
    val sc = corpus.sparkSession.sparkContext
    var it = 0
    while (it < iters) {
      // one round trains BOTH quantizers from the same bounded sample:
      // a coarse Lloyd round (shared with ivfTopK) and the per-(sub,
      // code, pos) PQ codebook means. Codebooks ride a per-round
      // broadcast (CentroidOps); the mean input is the flat posexplode
      // of the vector re-sliced into (subspace, within-subspace pos) —
      // same values, same decimal avg as the subvector-explode
      // formulation it replaces.
      // The two quantizers' rounds are INDEPENDENT within an iteration
      // (cents_{i+1} depends only on cents_i, books_{i+1} only on
      // books_i), so their driver round-trips run as CONCURRENT Spark
      // jobs (guide §2.6 — actions are sequential only because the
      // driver calls them sequentially): same collects, same decimal
      // means, bit-identical models, but the training critical path is
      // max(coarse, pq) per round instead of coarse + pq. r17
      // optimization — training is re-paid on every ivfPqTopK call, and
      // its 2·iters sequential driver round-trips were the dominant
      // fixed cost of q103/q104.
      val bcB = sc.broadcast(books)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fCents = Future(lloydRound(train, cents))
      val fPq = Future {
        train
          .withColumn("codes", graft.functions.CentroidOps.pqEncode(col("cv"), bcB))
          .select(col("codes"), posexplode(col("cv")))
          .select(
            (col("pos") / lit(dsub)).cast("int").as("sub"),
            pmod(col("pos"), lit(dsub)).as("pos2"),
            element_at(col("codes"), (col("pos") / lit(dsub)).cast("int") + 1).as("code"),
            col("col"))
          .groupBy("sub", "code", "pos2")
          .agg(avg(col("col").cast("decimal(28,10)")).as("m"))
          .collect()
      }
      val (nextCents, pqMeans) =
        try (Await.result(fCents, Duration.Inf), Await.result(fPq, Duration.Inf))
        finally pool.shutdown()
      cents = nextCents
      bcB.unpersist(blocking = false)
      val nextBooks = books.map(_.map(_.clone()))
      pqMeans.foreach(r =>
        nextBooks(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDecimal(3).doubleValue())
      books = nextBooks // empty codes keep their old entry
      it += 1
    }
    // the TRAINED model ships once as broadcasts — the task binaries of
    // every downstream stage carry handles, not nlist×dim (+ m×ksub×dsub)
    // of literal doubles (CentroidOps scaladoc)
    val bcC = sc.broadcast(cents)
    val bcB = sc.broadcast(books)
    // encode ONCE: cell + m codes + exact norm per corpus vector — the
    // only payload that crosses the probe exchange (no `cv` below it)
    val encoded = c.select(
      col("cand_id"),
      element_at(cellsTop(col("cv"), bcC, 1), 1).as("cell"),
      sqrt(graft.functions.VecDot.dot(col("cv"), col("cv"))).as("cn"),
      graft.functions.CentroidOps.pqEncode(col("cv"), bcB).as("codes"))
    // each query precomputes its ADC lookup table: luts[j][kk] = q_j · e_jk
    val probes = Dedup.widen(queries)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        sqrt(graft.functions.VecDot.dot(col("qv"), col("qv"))).as("qn"),
        graft.functions.CentroidOps.pqLut(col("qv"), bcB).as("luts"),
        explode_outer(cellsTop(col("qv"), bcC, nprobe)).as("cell"))
      .filter(col("cell").isNotNull)
      .select(col("query_id"), col("qn"), col("luts"), col("cell"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("adc_cos").desc, col("cand_id"))
    val cand = probes.join(encoded, "cell")
      .filter(col("query_id") =!= col("cand_id"))
      // ADC: approximate dot = Σ_j luts[j][codes[j]]; normalize by the
      // EXACT norms (carried per row) so ranking approximates cosine even
      // on an un-normalized corpus
      .withColumn("adc_cos",
        aggregate(
          zip_with(col("codes"), col("luts"),
            (code, lut) => element_at(lut, code + 1)),
          lit(0.0d), (acc, x) => acc + x) / (col("qn") * col("cn")))
      .withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= rerank)
      .select("query_id", "cand_id")
    // exact re-rank: rehydrate true vectors for rerank×|queries| rows only
    val qVecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cVecs = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id"))
    cand
      .join(cVecs, "cand_id")
      .join(qVecs, "query_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  // ------------------------------------------------------------ SemDeDup

  /** Corpus vectors with their k-means cell and centroid cosine — the
    * shared front half of [[semanticDedup]] / [[semanticDupPairs]].
    * Columns: (cand_id, cv, cell, centroid_cos, cells) where `cell` is
    * the primary (nearest) cell, `centroid_cos` the cosine to ITS
    * centroid, and `cells` the `probeCells` nearest cells for
    * multi-probe pair generation. Training mirrors [[ivfTopK]]'s
    * determinism contract exactly (lowest-id init, id-hash-bounded
    * sample, [[lloydRound]]'s decimal means, fixed iteration count); the
    * trained centroids join back as a broadcast of `nl` rows, so the
    * corpus takes ONE narrow pass for assignment. */
  private def cellAssigned(
      df: DataFrame, nlist: Int, iters: Int, trainPerCell: Int,
      probeCells: Int, idCol: String, vecCol: String): DataFrame =
    assignCells(df,
      trainCentroids(df, nlist, iters, trainPerCell, idCol, vecCol),
      probeCells, idCol, vecCol)

  /** Spherical k-means training exactly as [[ivfTopK]]'s determinism
    * contract: lowest-id init, id-hash-bounded sample, [[lloydRound]]'s
    * decimal means, fixed iteration count. Returns unit-norm centroids
    * indexed by cell id. */
  private[ops] def trainCentroids(
      df: DataFrame, nlist: Int, iters: Int, trainPerCell: Int,
      idCol: String, vecCol: String): Array[Array[Double]] = {
    val corpusN = df.count()
    val nl =
      if (nlist > 0) nlist
      else math.max(16, math.min(4096,
        math.ceil(math.sqrt(corpusN.toDouble)).toInt))
    val c = Dedup.widen(df)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    var cents: Array[Array[Double]] = df
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(nl)
      .collect()
      .map(r => normalized(r.getSeq[Number](1).map(_.doubleValue()).toArray))
    require(cents.nonEmpty, "semanticDedup: corpus is empty")
    val denom = math.max(1L, corpusN / (nl.toLong * trainPerCell))
    val train =
      if (denom <= 1L) c
      else c.filter(pmod(xxhash64(col("cand_id")), lit(denom)) === 0)
    var it = 0
    while (it < iters) {
      cents = lloydRound(train, cents)
      it += 1
    }
    cents
  }

  /** The spherical-k-means centroid model as `(cell, centv)` rows — the
    * trained front half of [[semanticDedup]] / [[semanticDupPairs]] /
    * [[semanticCellIndex]], exposed standalone because training is the
    * dominant cost of the SemDeDup family and a PURE DETERMINISTIC
    * function of (corpus, nlist, iters, trainPerCell) — compute it
    * once, persist or cache it keyed by a corpus fingerprint, and feed
    * it back through [[semanticDedupWith]] / [[semanticDupPairsWith]] /
    * [[assignBatchCells]]. */
  def trainedCentroids(
      df: DataFrame,
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainCentroids(df, nlist, iters, trainPerCell, idCol, vecCol)
      .zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centv")
  }

  /** [[semanticDupPairs]] under a GIVEN centroid model (`(cell, centv)`
    * rows from [[trainedCentroids]] or a persisted index sibling) —
    * assignment + pair generation + exact verification, no training. */
  def semanticDupPairsWith(
      df: DataFrame,
      centroids: DataFrame,
      threshold: Double,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes)
      maxCell: Int = 100000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    probedPairs(
      assignCells(df, collectCentroids(centroids), probeCells, idCol, vecCol),
      threshold, maxCell)

  /** [[semanticDedup]] under a GIVEN centroid model — identical drop
    * rule, no training. */
  def semanticDedupWith(
      df: DataFrame,
      centroids: DataFrame,
      threshold: Double,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes)
      maxCell: Int = 100000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    dropByPrecedence(
      assignCells(df, collectCentroids(centroids), probeCells, idCol, vecCol),
      threshold, maxCell, idCol)

  /** Resolve the multi-probe width. `probeCells = 0` is AUTO: scale
    * with the cell count as `max(4, ceil(log2(nlist) / 2))` — the q111
    * tuning policy made default. Rationale: `nlist` grows ~sqrt(corpus)
    * while a FIXED probe count covers a shrinking 4/nlist fraction of
    * cells, so measured same-cell pair recall decays with corpus growth
    * (0.94 → 0.93 → 0.81 across the sf0.001/0.01/0.1 10× steps at
    * fixed 4); log-scaling the probes counteracts the decay at a cost
    * that stays LINEAR replication of the id-only probe exchange — the
    * vectors never ride it. An explicit positive value is honored
    * unchanged (the fixed-width variant the cross-round measurements
    * use). At the current test scales AUTO resolves to 4, so the
    * measured q111 recall stays directly comparable. */
  private[graft] def resolveProbes(probeCells: Int, nlist: Int): Int =
    if (probeCells > 0) probeCells
    else math.max(4,
      math.ceil(math.log(math.max(1, nlist).toDouble) / math.log(2.0) / 2.0).toInt)

  /** Cell assignment under GIVEN centroids — the back half of
    * [[cellAssigned]], shared with the incremental path (which assigns
    * only the batch under the index's frozen centroids). One narrow
    * pass; centroids ride one broadcast. The single point where
    * `probeCells` is resolved ([[resolveProbes]]) — every semantic
    * entry path assigns through here, so AUTO means the same width on
    * both sides of an index join. */
  private def assignCells(
      df: DataFrame, cents: Array[Array[Double]], probeCells: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val probes = resolveProbes(probeCells, cents.length)
    import spark.implicits._
    val centsDf = broadcast(
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        .toDF("cell", "centv"))
    Dedup.widen(df)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("cells", cellsTop(col("cv"), bc, probes))
      .withColumn("cell", element_at(col("cells"), 1))
      .join(centsDf, "cell")
      // centroids are unit-norm, so this is dot(v, cent)/|v|; rounded to
      // 4 like every reported score, which also makes the precedence
      // order (centroid_cos, id) stable across platforms
      .withColumn("centroid_cos", round(cosine(col("cv"), col("centv")), 4))
      .select("cand_id", "cv", "cell", "centroid_cos", "cells")
  }

  /** Same-cell candidate pairs under multi-probe assignment: each vector
    * replicates into its `probeCells` nearest cells, a pair qualifies
    * when ANY cell is shared and its exact cosine clears the threshold.
    * `centroid_cos` stays the PRIMARY cell's, whichever probe cell
    * matched the pair — the precedence order must not depend on where a
    * pair happened to meet.
    *
    * Shuffle discipline (the [[cosineDupPairsLsh]] shape): ONLY
    * `(id, cell)` rides the probe exchange — a vector attached here
    * would cross the wire `probeCells` times, ×4 KB each at dim 1k.
    * Cell candidate lists are bounded by `maxCell` (a degenerate
    * training run collapsing the corpus into one cell caps loudly
    * instead of assembling it in one buffer); the deduped candidate
    * pairs rehydrate each endpoint's (vector, centroid_cos) exactly
    * once for exact verification. */
  private def probedPairs(
      assigned: DataFrame, threshold: Double, maxCell: Int): DataFrame = {
    // single band (band = 0, bucket = probe cell): the same shared
    // capped-bucket machinery as the MinHash / sign-LSH pair families
    val banded = assigned.select(
      col("cand_id").as("id"), lit(0).as("band"),
      explode(col("cells")).as("bucket"), lit(0L).as("isb"))
    val cand = Dedup.bucketPairs(banded, requireFlagged = false, cap = maxCell)
    verifySemanticPairs(cand, assigned, threshold)
  }

  /** Exact-cosine verification carrying each endpoint's primary
    * centroid cosine — shared by the full and incremental paths.
    * `assigned` must cover every candidate id. */
  private def verifySemanticPairs(
      cand: DataFrame, assigned: DataFrame, threshold: Double,
      groupedRehydrate: Boolean = false): DataFrame = {
    val perId = Dedup.restrictToCandidates(
      assigned.select(col("cand_id").as("id"),
        struct(col("cv").as("v"), col("centroid_cos").as("cc")).as("p")), cand)
    Dedup.rehydratePairs(cand, perId, groupedRehydrate)
      .withColumn("cos", round(cosine(col("p_a.v"), col("p_b.v")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"),
        col("p_a.cc").as("cc_a"), col("p_b.cc").as("cc_b"))
  }

  /** Persistable SemDeDup cell index: (postings, centroids) — postings
    * `(id, pcell)` are each vector's `probeCells` nearest cells, the
    * exact replication [[semanticDupPairs]] exchanges internally;
    * centroids `(cell, centv)` are the trained spherical-k-means model,
    * FROZEN at build time (the coarse-quantizer contract [[ivfTopK]]
    * documents: assignment under a fixed model, never per-ingest
    * retraining — re-cluster offline when drift warrants and rebuild).
    * Persist both; append an accepted batch's postings
    * ([[assignBatchCells]]); deletes remove the id's rows. */
  def semanticCellIndex(
      df: DataFrame,
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes) — must match query side
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val cents = trainCentroids(df, nlist, iters, trainPerCell, idCol, vecCol)
    val spark = df.sparkSession
    import spark.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cell", "centv")
    val postings = assignCells(df, cents, probeCells, idCol, vecCol)
      .select(col("cand_id").as("id"), explode(col("cells")).as("pcell"))
    (postings, centsDf)
  }

  /** A batch's cell postings under a persisted centroid model — what a
    * deployment appends to the postings index after accepting the
    * batch. */
  def assignBatchCells(
      batch: DataFrame,
      centroids: DataFrame,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes) — must match query side
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assignCells(batch, collectCentroids(centroids), probeCells, idCol, vecCol)
      .select(col("cand_id").as("id"), explode(col("cells")).as("pcell"))

  /** `(cell, centv)` rows back to the broadcastable model array —
    * nlist × dim doubles, the same bounded driver payload the training
    * loop already holds. */
  private def collectCentroids(centroids: DataFrame): Array[Array[Double]] =
    centroids.select("cell", "centv").collect()
      .map(r => r.getInt(0) -> r.getSeq[Number](1).map(_.doubleValue()).toArray)
      .sortBy(_._1).map(_._2)

  /** SemDeDup pairs an ingested `batch` forms with the corpus AND within
    * itself, WITHOUT re-assigning the corpus — the semantic twin of
    * [[graft.ops.Dedup.incrementalMinhashPairs]] /
    * [[incrementalCosineDupPairs]], same slice construction: the batch
    * is assigned under the index's FROZEN centroids, the persisted
    * postings are semi-joined to the batch's touched cells, and the
    * shared candidate+verify machinery runs on that slice. Equals
    * same-centroid full-corpus pair generation restricted to pairs with
    * at least one batch side, cell caps included (pinned in OpsSpec via
    * the empty-corpus construction; q118 audits it in-battery).
    * Verification recomputes each candidate's exact vector cosine and
    * primary centroid cosine from `corpus ∪ batch` vectors, restricted
    * to candidate ids BEFORE shipping. */
  def incrementalSemanticDupPairs(
      batch: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      threshold: Double,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes)
      maxCell: Int = 100000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    val batchAssigned = assignCells(batch, cents, probeCells, idCol, vecCol)
    val batchPost = batchAssigned
      .select(col("cand_id").as("id"), explode(col("cells")).as("pcell"))
    // cells are a single-band posting family: band = 0, bucket = pcell
    def asBanded(post: DataFrame) = post.select(
      col("id"), lit(0).as("band"), col("pcell").as("bucket"))
    val cand = Dedup.incrementalCandidates(
      asBanded(batchPost), asBanded(index), cap = maxCell)
    // verification universe: corpus ∪ batch vectors, semi-joined down to
    // candidate ids BEFORE cell re-assignment — cellsTop is nlist × dim
    // dot products per row, exactly the per-corpus-vector cost this
    // operator exists to avoid, so the restriction must precede it in
    // the plan rather than hope the optimizer pushes it
    val universe = corpus.select(col(idCol), col(vecCol))
      .unionByName(batch.select(col(idCol), col(vecCol)))
    val restricted = Dedup.restrictToCandidates(
      universe.select(col(idCol).as("id"), col(vecCol).as("p")), cand)
      .select(col("id").as(idCol), col("p").as(vecCol))
    // grouped rehydration: slice-bounded incremental candidates, and the
    // per-id payload here embeds a cell re-assignment (cellsTop) whose
    // duplication would dominate (see Dedup.rehydratePairs)
    verifySemanticPairs(
      cand, assignCells(restricted, cents, probeCells, idCol, vecCol), threshold,
      groupedRehydrate = true)
  }

  /** The SHARED-CELL near-dup candidate pairs SemDeDup considers: every
    * (id_a < id_b) pair meeting in at least one of each side's
    * `probeCells` nearest k-means cells with exact cosine >=
    * `threshold`, plus both endpoints' primary centroid cosines.
    * Precision is 1.0 by construction (each pair's cosine is exactly
    * computed); recall vs a global pairwise dedup is what the cell
    * partition trades away — multi-probe widens it at a linear
    * replication cost (the IVF nprobe idea applied to dedup), and the
    * q111 audit measures and floors it. */
  def semanticDupPairs(
      df: DataFrame,
      threshold: Double,
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes)
      maxCell: Int = 100000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    probedPairs(
      cellAssigned(df, nlist, iters, trainPerCell, probeCells, idCol, vecCol),
      threshold, maxCell)

  /** Semantic deduplication (Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): k-means the embedding space into ~sqrt(corpus)
    * cells, call two items semantic duplicates when their cosine within
    * the SAME cell clears `threshold`, and from every duplicate relation
    * keep the item FARTHEST from its cell centroid (the paper's
    * keep-the-diverse-representative rule).
    *
    * Drop rule, window-free and chain-free exactly like the paper's
    * released triangular-matrix implementation: an item is dropped iff
    * some neighbor sharing one of its `probeCells` nearest cells with
    * cosine >= threshold PRECEDES it in the (centroid_cos ASC, id ASC)
    * order — one pair generation ([[semanticDupPairs]]), one projection
    * picking each pair's later endpoint, one distinct. Whether the
    * earlier neighbor itself survives is irrelevant (no iterative
    * chasing), so the whole operator is a fixed number of shuffles
    * (cell exchange + pair dedup + distinct) at any scale.
    *
    * Returns one row per input vector: (idCol, cell, centroid_cos,
    * kept). Approximate BY DESIGN vs global pairwise dedup — near-dups
    * split across a cell boundary are missed; q111 pins the measured
    * same-cell pair recall, and OpsSpec pins the drop semantics on a
    * fixture with known clusters. */
  def semanticDedup(
      df: DataFrame,
      threshold: Double,
      nlist: Int = 0,
      iters: Int = 3,
      trainPerCell: Int = 256,
      probeCells: Int = 0, // 0 = AUTO (resolveProbes)
      maxCell: Int = 100000,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    dropByPrecedence(
      cellAssigned(df, nlist, iters, trainPerCell, probeCells, idCol, vecCol),
      threshold, maxCell, idCol)
  }

  /** The SemDeDup drop rule over an assigned frame — shared by the
    * training and given-model ([[semanticDedupWith]]) entry points. */
  private def dropByPrecedence(
      assigned: DataFrame, threshold: Double, maxCell: Int,
      idCol: String): DataFrame = {
    // the pair's LATER endpoint in (centroid_cos, id) order is dropped;
    // struct comparison is lexicographic, ids are unique, so ties on
    // the rounded cosine break deterministically
    val dropped = probedPairs(assigned, threshold, maxCell)
      .select(when(
          struct(col("cc_a"), col("id_a")) < struct(col("cc_b"), col("id_b")),
          col("id_b")).otherwise(col("id_a")).as("cand_id"))
      .distinct()
    assigned
      .join(dropped.withColumn("__d", lit(true)), Seq("cand_id"), "left")
      .select(col("cand_id").as(idCol), col("cell"), col("centroid_cos"),
        col("__d").isNull.as("kept"))
  }
}
