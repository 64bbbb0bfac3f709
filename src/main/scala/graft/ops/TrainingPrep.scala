package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set preparation operators: the steps between "clean corpus"
  * and "batches on the accelerator" — deterministic splitting (the
  * battery's q66 hash-split), concat-and-chunk sequence packing,
  * train/holdout contamination detection (exact and n-gram, the GPT-3 /
  * decontamination-report shape), TF-IDF term extraction, stratified
  * sampling, data-mixture rebalancing, and the composed
  * [[prepareCorpus]] cleanup pipeline.
  *
  * All use the arithmetic id-hash family (engine-portable, unlike
  * xxhash64) so results are reproducible across runs, partitionings and
  * engines, and every operator is expressible as an oracle in plain SQL
  * (battery q66, q68–q71, q73–q74, q77).
  */
object TrainingPrep {

  /** The arithmetic id hash every operator in this module keys on,
    * overflow-free for EVERY long id: the id is reduced mod the prime
    * FIRST, so the multiplication peaks at 1000002 × 2654435761 ≈ 2.7e15,
    * far inside signed-64 range. A naive `(id * 2654435761) % 1000003`
    * wraps negative for ids above ~3.47e9 (a few billion documents in),
    * and a negative `%` result silently mis-classifies every overflowing
    * id — while engines with checked arithmetic (DuckDB) error out
    * instead. `pmod(id, p) * m ≡ id * m (mod p)`, so this is congruent
    * to the naive form wherever the naive form doesn't overflow: same
    * assignments at any corpus size that fits in 32 bits, and
    * well-defined determinism beyond.
    *
    * Precondition, ENFORCED: ids are NON-NEGATIVE (every testdata/
    * battery id is). For a negative id this pmod form yields a
    * non-negative hash while plain SQL `%` (truncated remainder, as in
    * the battery's DuckDB oracle forms) yields a negative one — so an
    * engine-vs-oracle comparison over negative ids would diverge even
    * though both sides are individually deterministic, silently
    * mis-splitting/mis-sharding the corpus. The guard raises at the
    * first negative id instead (one codegen'd branch per row — noise
    * next to the multiply); hash negative id spaces through an explicit
    * `abs`/offset first. */
  def idHash(id: Column): Column =
    when(id < 0, raise_error(concat(
      lit("idHash requires non-negative ids (negative ids hash "),
      lit("differently under SQL truncated-remainder oracles); got "),
      id.cast("string"))))
      .otherwise(pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000003L)))

  /** Deterministic train/holdout assignment from an integer id — same
    * arithmetic hash as the battery's q66 split, factored for reuse.
    * Stable across runs/partitionings/engines; sample-by-rand never is. */
  def splitCol(id: Column, trainPct: Int = 90): Column =
    when(idHash(id) % 100 < trainPct,
      lit("train")).otherwise(lit("holdout"))

  /** Deterministic shard assignment (same hash family, different
    * modulus) — the unit of parallelism for [[packChunks]]. */
  def shardCol(id: Column, shards: Int): Column =
    idHash(id) % shards

  /** Concat-and-chunk sequence packing: documents are laid out
    * back-to-back in (shard, id) order and the token stream is cut every
    * `chunkTokens` tokens — exactly how pretraining batches are formed.
    * Emits each document's start offset in its shard's token stream and
    * the chunk index its first token lands in.
    *
    * Scale design: a single global token stream would be ONE window
    * partition = one task at any cluster size. Docs are instead sharded
    * by a deterministic id-hash into `shards` independent streams
    * (optionally sub-partitioned by `groupCols`, e.g. language), so the
    * cumulative sum runs as `shards × |groups|` parallel window
    * partitions and per-task state is one running long. Layout depends
    * only on ids, never on physical partitioning. */
  def packChunks(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 2048,
      shards: Int = 64,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window
      .partitionBy((groupCols :+ "shard").map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        (col(idCol) +: groupCols.map(col)) :+
          shardCol(col(idCol), shards).as("shard") :+
          TextAnalysis.tokenCount(col(textCol)).as("n_tok"): _*)
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk", expr(s"start_tok div $chunkTokens"))
  }

  /** Exact train/holdout contamination: holdout documents whose
    * normalized text also appears in the train split — the leakage an
    * eval-set release must catch. Emits each contaminated holdout doc
    * with the number of train-side copies and the smallest train id.
    *
    * Scale design: the train side collapses to one row per distinct
    * text via an aggregate (map-side combine absorbs even a
    * billion-copy boilerplate doc before the shuffle), then the holdout
    * slice inner-joins it. Deliberately NOT a window keyed on the text:
    * a window partition holds every copy of a duplicated document and
    * cannot be skew-split, whereas the join is AQE-skew-handled and the
    * aggregate output is distinct-texts-sized (AQE broadcasts it when
    * small). */
  def splitContamination(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      trainPct: Int = 90): DataFrame = {
    val d = df.select(col(idCol).as("id"),
      splitCol(col(idCol), trainPct).as("split"),
      Dedup.normalize(col(textCol)).as("__norm"))
    val train = d.filter(col("split") === "train")
      .groupBy("__norm")
      .agg(count(lit(1)).as("n_train_dups"), min(col("id")).as("first_train_dup"))
    d.filter(col("split") === "holdout")
      .join(train, "__norm")
      .select(col("id").as(idCol), col("n_train_dups"), col("first_train_dup"))
  }

  /** The same contamination semantics pointed the direction a 100 TB
    * pretraining run needs: which TRAIN documents duplicate a
    * holdout/benchmark document (and must be dropped before training),
    * found with a broadcast Bloom-filter prefilter over the benchmark
    * set.
    *
    * Scale shape: the holdout side is benchmark-sized (thousands to
    * millions of rows), the train side is the 100 TB corpus. A plain
    * join ships every distinct train text through a shuffle just to
    * discard ~all of them; instead the holdout norms build one Bloom
    * filter (driver-side via `DataFrameStatFunctions.bloomFilter`, ~1.2
    * MB per million entries at 1% fpp) that broadcasts to every
    * executor, and the corpus scan drops non-members BEFORE any
    * exchange — the only shuffled rows are the Bloom survivors: true
    * hits plus an fpp-sized sliver. The exact join that follows runs on
    * that sliver alone and removes the false positives, so the RESULT is
    * exact (Bloom filters have no false negatives; the battery's q96
    * hash-verifies it against the plain-SQL oracle). The membership
    * probe is a Scala UDF — non-codegen, but it replaces a shuffle of
    * the corpus, not a scalar column op in a hot loop.
    *
    * Emits each contaminated train doc with the number of holdout
    * matches and the smallest matching holdout id. */
  /** SEMANTIC decontamination — the similarity complement of the
    * exact / n-gram / Bloom trio: a corpus item is contaminated when its
    * EMBEDDING sits within `threshold` cosine of any holdout/benchmark
    * item, even with zero token overlap (the embedding-based
    * decontamination used by Gunasekar et al. 2023, "Textbooks Are All
    * You Need" §2.3, against paraphrased benchmark leakage). Returns the
    * contaminated corpus rows with their CLOSEST holdout item and the
    * exact cosine: (vec_id, holdout_id, cos); ties on the rounded cosine
    * break to the lowest holdout id.
    *
    * Scale: the holdout set (benchmarks — thousands, not billions)
    * broadcasts; the corpus is scanned ONCE against it, and the per-row
    * max collapses map-side (partial agg over the corpus id), so the
    * exchange carries one row per corpus vector, no pair blowup. Exact
    * by construction — no recall floor needed, and fully SQL-expressible
    * (q113's DuckDB oracle). */
  def semanticContamination(
      corpus: DataFrame,
      holdout: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = Dedup.widen(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val h = broadcast(
      holdout.select(col(idCol).as("holdout_id"), col(vecCol).as("hv")))
    c.crossJoin(h)
      .withColumn("cos", round(Similarity.cosine(col("cv"), col("hv")), 4))
      .groupBy("vec_id")
      // lexicographic max of (cos, -holdout_id): max cosine, then the
      // LOWEST holdout id on a rounded-cosine tie — deterministic
      .agg(max(struct(col("cos"), (lit(0L) - col("holdout_id")).as("nhid")))
        .as("best"))
      .select(col("vec_id"), (lit(0L) - col("best.nhid")).as("holdout_id"),
        col("best.cos").as("cos"))
      .filter(col("cos") >= threshold)
  }

  def bloomDecontaminate(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      trainPct: Int = 90,
      fpp: Double = 0.01): DataFrame = {
    val d = df.select(col(idCol).as("id"),
      splitCol(col(idCol), trainPct).as("split"),
      Dedup.normalize(col(textCol)).as("__norm"))
    val holdout = d.filter(col("split") === "holdout")
      .groupBy("__norm")
      .agg(count(lit(1)).as("n_holdout"), min(col("id")).as("first_holdout"))
    val train = d.filter(col("split") === "train")
    // the count also sizes the filter exactly (post-groupBy = distinct
    // norms); stat.bloomFilter NPEs on an empty frame, and with no
    // holdout rows there is nothing to prefilter anyway
    val nHoldout = holdout.count()
    val prefiltered = if (nHoldout == 0L) train else {
      val bf = holdout.stat.bloomFilter("__norm", nHoldout, fpp)
      val bcBf = df.sparkSession.sparkContext.broadcast(bf)
      val mightContain =
        udf((s: String) => s != null && bcBf.value.mightContainString(s))
      train.filter(mightContain(col("__norm"))) // narrow prefilter, no shuffle
    }
    prefiltered
      .join(holdout, "__norm") // exact: kills Bloom false positives
      .select(col("id").as(idCol), col("n_holdout"), col("first_holdout"))
  }

  /** N-gram train/holdout contamination (the GPT-3 13-gram rule): for
    * each holdout document, how many of its distinct word `k`-grams also
    * appear in ANY train document. Near-dup leakage that exact matching
    * misses — a holdout doc sharing long verbatim spans with train data
    * is still contamination.
    *
    * Scale design: no pair generation — contamination is a per-gram
    * boolean ("seen in train?"), never the O(df²) explode of the Jaccard
    * pair machinery. The train-side gram set collapses to one row per
    * distinct gram (map-side combine absorbs boilerplate grams repeated
    * across billions of docs), and holdout postings LEFT-join it — the
    * join is AQE-skew-splittable, unlike a window keyed on the gram,
    * whose partition would hold every occurrence of a hot gram. No df
    * cap: dropping a hot gram here would silently hide contamination. */
  def ngramContamination(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 13,
      trainPct: Int = 90): DataFrame = {
    val posts = Dedup.widen(df)
      .select(col(idCol).as("id"), splitCol(col(idCol), trainPct).as("split"),
        explode_outer(Dedup.shingles(Dedup.normalize(col(textCol)), k))
          .as("shingle"))
      .filter(col("shingle").isNotNull)
    val trainGrams = posts.filter(col("split") === "train")
      .select("shingle").distinct().withColumn("in_train", lit(1))
    posts.filter(col("split") === "holdout")
      .join(trainGrams, Seq("shingle"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("in_train"), lit(0))).as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .select(col("id").as(idCol), col("n_grams"), col("n_contaminated"))
  }

  /** Leakage-safe train/holdout split: assign every document the split
    * of its NEAR-DUP CLUSTER representative, so a whole cluster lands
    * in one split by construction. The plain id-hash split
    * ([[splitCol]]) leaks through near-duplicates — a holdout doc's
    * 0.9-Jaccard twin lands in train ~90% of the time, and n-gram
    * decontamination (q70) then has to find and drop it after the
    * fact; hashing the cluster label instead makes that class of
    * leakage impossible up front (the standard fix, cf. the
    * dedup-before-split recipe in Lee et al. 2022 §4).
    *
    * `pairs` is any near-dup pair frame (`id_a`, `id_b`) — exact
    * Jaccard, MinHash-LSH, SimHash, embedding dedup all produce the
    * shape. Cost at scale = the connected-components pass itself
    * ([[Dedup.dedupClusters]]: near-dup graphs are diameter-2/3, a
    * couple of join+agg rounds); the split is then one more hash
    * column. Singletons keep their own id as cluster, so docs with no
    * near-dup split exactly as [[splitCol]] would. */
  def clusterSafeSplit(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      trainPct: Int = 90): DataFrame =
    Dedup.dedupClusters(df, pairs, idCol)
      .withColumn("split", splitCol(col("cluster"), trainPct))

  /** End-to-end corpus preparation — the composed cleanup a release
    * pipeline runs in one call: exact dedup (smallest-id survivor per
    * normalized text), quality-score filter, PII redaction, and the
    * deterministic train/holdout split. One aggregation shuffle (the
    * dedup); everything after is a narrow map over the survivors.
    * Each stage is individually oracle-verified elsewhere (q40, q44,
    * q63, q66); the battery's q77 verifies the composition. */
  def prepareCorpus(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      qualityMin: Double = 0.6,
      trainPct: Int = 90): DataFrame =
    Dedup.exact(df, idCol, textCol)
      .withColumn("quality", TextAnalysis.qualityScore(col("norm_text")))
      .filter(col("quality") >= qualityMin)
      .select(col(idCol),
        splitCol(col(idCol), trainPct).as("split"),
        col("quality"),
        TextAnalysis.redactPii(col("norm_text")).as("text"),
        col("n_copies"))

  /** Deterministic stratified sample: the `n` documents with the
    * smallest id-hash per stratum (ties by id). Unlike `df.sample`, the
    * selection is a pure function of ids — stable across runs,
    * partitionings and engines, so a downsampled corpus is reproducible
    * and auditable.
    *
    * Scale design: row_number + filter is the shape Spark rewrites with
    * WindowGroupLimit (each map task keeps only its local top-n per
    * stratum before the shuffle), so a billion-doc stratum never sorts
    * in one task. */
  def stratifiedSample(
      df: DataFrame,
      n: Int,
      strataCols: Seq[String] = Seq("lang"),
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val h = idHash(col(idCol))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Mixture rebalancing: downsample each key (source, language, ...)
    * so the surviving corpus matches `weights` as closely as possible
    * WITHOUT upsampling — the data-mixture step of every pretraining
    * recipe. The target total is the largest T with n_k >= w_k·T for
    * every key (the scarcest key keeps 100%), each key keeps the
    * fraction w_k·T/n_k, and membership is the deterministic id-hash
    * threshold, so the rebalanced corpus is reproducible. Keys absent
    * from `weights` are dropped (weight 0).
    *
    * Scale design: one full scan + filter. The per-key bookkeeping
    * (counts, target total, keep fractions) lives in a keys-sized frame
    * that broadcasts into the scan — the corpus itself is never
    * shuffled. */
  def rebalanceMixture(
      df: DataFrame,
      weights: Map[String, Double],
      keyCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "rebalanceMixture needs positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.sortBy(_._1).toDF(keyCol, "__w")
    val counts = df.join(broadcast(wDf), keyCol)
      .groupBy(keyCol, "__w").agg(count(lit(1)).as("__n"))
    val t = counts.agg(min(col("__n") / col("__w")).as("__t"))
    val frac = counts.crossJoin(broadcast(t))
      .withColumn("__keep",
        least(lit(1.0), col("__w") * col("__t") / col("__n")))
      .select(col(keyCol), col("__keep"))
    df.join(broadcast(frac), keyCol)
      .filter(idHash(col(idCol)) <
        (col("__keep") * lit(1000003L)).cast("long"))
      .drop("__keep")
  }

  /** Top-`topK` TF-IDF terms per document (ties broken by term,
    * ascending; scores rounded to 4 places BEFORE ranking so the
    * ordering is stable across engines whose `ln` differs in the last
    * ulp). `corpusN` must be the row count of `df` — passed in rather
    * than counted here so callers composing several operators over one
    * table pay the count once.
    *
    * Scale design: document frequency is a per-term AGGREGATE of the
    * (doc, term) tf table, attached back with a join — deliberately NOT
    * `count(*) over (partition by term)`, which would sort every
    * occurrence of a stopword-grade term into ONE window partition
    * (unbounded task size on natural language, and WindowExec cannot be
    * skew-split). The aggregate's map-side combine collapses each
    * partition to one row per term before the shuffle, the df table is
    * vocabulary-sized so AQE broadcasts it in the common case, and when
    * it must shuffle instead, AQE's skew-join splitting applies. The tf
    * subtree feeds both branches and is recomputed rather than cached:
    * recompute is a linear constant factor, a hot-term window partition
    * is not. */
  def tfidfTopTerms(
      df: DataFrame,
      corpusN: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      topK: Int = 3): DataFrame = {
    val tf = Dedup.widen(df)
      .select(col(idCol).as("id"),
        explode_outer(split(Dedup.normalize(col(textCol)), " ")).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfByTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfByTerm, "term")
      .withColumn("score",
        round(col("tf") * log(lit(corpusN.toDouble) / col("df").cast("double")), 4))
    val wDoc = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(wDoc))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("rank"), col("term"), col("score"))
  }

  /** Overlapping fixed-size token chunks per document — the
    * retrieval/embedding-side sibling of [[packChunks]] (RAG pipelines
    * chunk with overlap so no answer span straddles a boundary
    * uncovered; packing concatenates without overlap for pretraining).
    *
    * Chunk i covers tokens `[1 + i·stride, min(1 + i·stride + chunk-1, n)]`
    * with `stride = chunkTokens - overlapTokens`; a doc emits
    * `1 + ceil((n - chunk)/stride)` chunks (one when it fits whole), so
    * the final chunk always reaches the last token and consecutive
    * chunks share exactly `overlapTokens` tokens. A pure narrow
    * transform + generator — per-doc state only, NO shuffle at any
    * corpus size; chunk identity depends only on the doc's own tokens. */
  def chunkDocuments(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 128,
      overlapTokens: Int = 32): DataFrame = {
    val stride = chunkTokens - overlapTokens
    require(stride > 0,
      s"overlapTokens ($overlapTokens) must be smaller than chunkTokens ($chunkTokens)")
    // the SAME tokenizer as TextAnalysis.tokenCount, by construction:
    // chunk counts and token budgets must agree on what a token is
    // (an inline split would silently diverge on odd whitespace)
    val base = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__nc",
        when(col("__n") <= chunkTokens, lit(1))
          .otherwise(ceil((col("__n") - chunkTokens).cast("double") / stride)
            .cast("int") + 1))
    base
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_no"))
      .select(
        col(idCol),
        col("chunk_no"),
        least(lit(chunkTokens), col("__n") - (col("chunk_no") * stride))
          .cast("int").as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_no") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Deterministic TOKEN-BUDGET sampling per group: keep documents of
    * each `groupCol` value (source, language, ...) in a deterministic
    * pseudo-random order until the group's cumulative token count would
    * exceed its budget — "give me ~50 B tokens of web, 10 B of code",
    * the mixture-construction primitive [[rebalanceMixture]]'s
    * doc-count form can't express (doc counts ≠ token counts when
    * length distributions differ across sources).
    *
    * Order within a group is (shard, idHash, id) — pseudo-random via
    * the same arithmetic [[idHash]] as every operator here (stable
    * across runs/partitionings/engines), with the shard as the MAJOR
    * key so the cumulative sum can run sharded: per-shard token totals
    * are a tiny aggregate (groups × shards rows, broadcast-joined back
    * as each shard's starting offset), and the within-shard
    * cumsum is a window over (group, shard) — `shards` parallel
    * bounded partitions per group instead of one unbounded partition
    * holding the whole group (the same sharded-cumsum shape as
    * [[packChunks]]). A doc is kept iff its inclusive running total
    * (shard offset + within-shard cumsum) fits the budget — so the
    * kept set is a deterministic function of ids alone, and a group's
    * first over-budget doc is the cut, not a probabilistic target like
    * sample(). Groups absent from `budgets` are dropped. */
  def tokenBudgetSample(
      df: DataFrame,
      budgets: Map[String, Long],
      idCol: String = "doc_id",
      textCol: String = "text",
      groupCol: String = "source",
      shards: Int = 64): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample needs at least one group budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (e, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(e)
    }
    val base = df
      .select(col(idCol), col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("__budget", budgetCol)
      .filter(col("__budget").isNotNull)
      .withColumn("__shard", shardCol(col(idCol), shards))
      .withColumn("__h", idHash(col(idCol)))
    // per-(group, shard) totals: groups × shards rows — driver-safe
    val offsets = base.groupBy(groupCol, "__shard")
      .agg(sum(col("n_tok")).as("__t"))
      .withColumn("__off",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(groupCol).orderBy(col("__shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__shard"), col("__off"))
    val w = Window.partitionBy(groupCol, "__shard")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .join(broadcast(offsets), Seq(groupCol, "__shard"))
      .withColumn("cum_tok", col("__off") + sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= col("__budget"))
      .select(col(idCol), col(groupCol), col("n_tok"), col("cum_tok"))
  }

  /** Per-domain frequency capping (the C4/RefinedWeb anti-boilerplate
    * policy): keep at most `cap` documents per domain, preferring the
    * highest `priorityCol` (quality score, length) with ties broken by
    * lowest id. WINDOW-FREE by design: a `row_number` over the domain
    * partition would sort one partition per domain — and the web's head
    * domain at 100 TB is a single giant partition. Instead the kept set
    * comes from the bounded-heap [[graft.functions.TopKAggregator]]
    * (each executor holds ≤ cap rows per domain per partition; the
    * exchange carries ≤ cap × domains rows), then one semi-join
    * rehydrates the surviving rows. The hottest domain costs a bounded
    * merge, never a sort. */
  def perDomainCap(
      df: DataFrame,
      cap: Int,
      domainCol: String = "registered_domain",
      priorityCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(cap).toColumn
    val kept = df
      .select(col(domainCol).cast("string"),
        col(priorityCol).cast("double"), col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .map { case (d, p, i) => (d, graft.functions.ScoredId(p, i)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .flatMap { case (_, top) => top.iterator.map(_.id) }
      .toDF(idCol)
    // each doc has exactly one domain, so the kept ids are unique and a
    // left-semi preserves rows 1:1 with no duplication
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Per-group quality-quantile gate (the DCLM / FineWeb "keep the best
    * (1−q) of every source" policy): rows survive when `scoreCol` >= the
    * group's q-quantile, with the cutoff carried along as `q_cutoff`.
    *
    * WINDOW-FREE by design, like [[perDomainCap]]: a percent_rank over
    * the group partition would sort one partition per source — and a
    * head source at 100 TB is a single giant partition. Instead the
    * cutoffs are one aggregation (one row per group), joined back under
    * AQE (group-count-sized table → broadcast), and the gate is a plain
    * filter over the scan.
    *
    * `exact = false` (default) uses `approx_percentile` — the 100 TB
    * path: a mergeable sketch per group, no per-group value buffering;
    * its drift vs exact is the same trade q65's audit measures.
    * `exact = true` uses Catalyst's exact `percentile` (buffers each
    * group's values — bounded groups only) and matches DuckDB's
    * `quantile_cont` bit-for-bit after the q26-style epsilon-nudged
    * rounding, which is what makes the battery's q117 a hash-matched
    * gate rather than a rows-only one. */
  def qualityQuantileGate(
      df: DataFrame,
      scoreCol: String,
      q: Double,
      groupCols: Seq[String],
      exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(q > 0 && q < 1, s"quantile must be in (0, 1), got $q")
    require(groupCols.nonEmpty, "qualityQuantileGate needs at least one group column")
    val cutExpr =
      if (exact) call_function("percentile", col(scoreCol), lit(q))
      else call_function("approx_percentile", col(scoreCol), lit(q), lit(accuracy))
    val cuts = df.groupBy(groupCols.map(col): _*)
      .agg(round(cutExpr + lit(1e-6), 4).as("q_cutoff"))
      // NULL group values form their own source group (SQL GROUP BY
      // semantics, matching DuckDB's): the gate join must be null-SAFE,
      // because a plain equi-join can never match null=null and would
      // silently drop every null-group row from the output — neither
      // gated nor passed through
      .select(groupCols.map(g => col(g).as(s"__cut_$g")) :+ col("q_cutoff"): _*)
    val cond = groupCols.map(g => df(g) <=> cuts(s"__cut_$g")).reduce(_ && _)
    df.join(cuts, cond)
      .filter(col(scoreCol) >= col("q_cutoff"))
      .drop(groupCols.map(g => s"__cut_$g"): _*)
  }
}
