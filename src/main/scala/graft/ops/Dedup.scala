package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. All deterministic (fixed hash seeds).
  *
  * Scale design: nothing here is all-pairs. Exact dedup is a hash
  * aggregation on the normalized text; near-dup candidates come from
  * LSH band-buckets / SimHash bands, so the join fan-out is bounded by
  * bucket sizes, not n². At 100 TB the shuffles are: one groupBy for
  * exact, one explode+groupBy per band family for LSH.
  */
object Dedup {

  /** Spread CPU-bound per-document derivation (shingling, signatures)
    * across the cluster when the scan under-parallelizes: a small input —
    * or a single-row-group parquet file, which is unsplittable no matter
    * what `maxPartitionBytes` says — arrives as one partition and would
    * pin the whole operator to one core. The repartition only fires when
    * partitions < defaultParallelism, so at 100 TB (thousands of scan
    * splits) it is a no-op; when it does fire the shuffled payload is by
    * definition small. */
  private[ops] def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Explicit hash-partitioned exchange on `key` that AQE will NOT
    * coalesce. The grouped-pair operators below fan out AFTER their
    * shuffle (posting lists explode into O(df²) pairs), but AQE sizes
    * post-shuffle partitions by MAPPER output bytes — it cannot see the
    * reduce-side expansion, so a few-MB shingle shuffle gets coalesced to
    * 1-3 partitions and the pair explosion runs nearly single-threaded.
    * A user repartition with an explicit count pins the exchange; the
    * per-group size caps (maxDocFreq / bucket caps) bound skew, which is
    * the risk AQE would otherwise handle. */
  private[ops] def byKey(df: DataFrame, key: Column*): DataFrame = {
    val sc = df.sparkSession
    val n = sc.sparkContext.defaultParallelism
    df.repartition(n, key: _*)
  }

  /** Semi-join a per-id table down to the ids appearing in a candidate
    * pair list — filtering BEFORE any expensive per-doc derivation keeps
    * that derivation off the non-candidate 99.99% at 100 TB. No broadcast
    * hint: per-bucket caps bound each bucket, not the UNION of buckets,
    * so the distinct candidate-id set can approach corpus cardinality on
    * a near-dup-heavy corpus — a forced broadcast would blow the driver
    * there. AQE picks broadcast at runtime when the set is actually small
    * (the common case) and a shuffled semi-join when it isn't. */
  private[ops] def restrictToCandidates(perId: DataFrame, cand: DataFrame): DataFrame = {
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    perId.join(candIds, Seq("id"), "left_semi")
  }

  /** Re-attach a per-id payload column `p` to candidate pairs
    * `(id_a, id_b)` → `(id_a, id_b, p_a, p_b)`: two plain equi-joins,
    * one per endpoint. Shared by the MinHash-LSH and embedding-LSH
    * verification stages.
    *
    * Why two joins and not the explode-into-sides + groupBy(pair) shape
    * this replaced (r17 optimization; guide §2.3/§3.1): the grouped
    * shape ships BOTH endpoints' payloads through a pair-keyed exchange
    * — the payload-heaviest shuffle of every verification stage (at
    * sf0.1 it was 300-420 MB of shingle arrays / embedding vectors per
    * audit query, 60-75% of their total shuffle) — and buffers them in
    * an aggregation. Plain joins let AQE broadcast `perId` (it is the
    * candidate-restricted slice, small in the common case), so the pair
    * list is often never exchanged at all; when `perId` is too big to
    * broadcast, each payload still crosses the wire exactly once per
    * endpoint (the same bytes the grouped shape paid), minus the
    * explode doubling and the aggregation buffer. Equivalence: `cand`
    * is deduped upstream and `perId` has one row per id, so the join
    * neither duplicates nor drops pairs; a candidate id absent from
    * `perId` (impossible via restrictToCandidates, which derives
    * `perId` from `cand`) would previously yield a null payload that
    * every downstream score-filter discarded — the inner join drops the
    * same pair one step earlier. */
  private[ops] def rehydratePairs(
      cand: DataFrame, perId: DataFrame, grouped: Boolean = false): DataFrame =
    if (grouped) {
      // grouped shape: each pair explodes into two (pair, id, side) rows,
      // the payload joins ONCE, and a pair-keyed aggregation reassembles
      // (p_a, p_b). The per-id payload DERIVATION is evaluated exactly
      // once — the right trade when that derivation dominates (char-gram
      // shingling of candidate docs) or when the candidate list is
      // slice-bounded by construction (the incremental ingest paths,
      // whose pair volume is O(touched buckets), so the payload-bearing
      // pair exchange this shape pays is small).
      val sides = cand.select(
        explode(array(
          struct(col("id_a"), col("id_b"), col("id_a").as("id"), lit("a").as("side")),
          struct(col("id_a"), col("id_b"), col("id_b").as("id"), lit("b").as("side"))))
          .as("s"))
        .select(col("s.id_a"), col("s.id_b"), col("s.id"), col("s.side"))
      sides.join(perId, "id")
        .groupBy("id_a", "id_b")
        .agg(
          first(when(col("side") === "a", col("p")), ignoreNulls = true).as("p_a"),
          first(when(col("side") === "b", col("p")), ignoreNulls = true).as("p_b"))
    } else {
      // join shape (r17 optimization; guide §2.3/§3.1): two plain
      // equi-joins, one per endpoint. The grouped shape ships BOTH
      // payloads through a pair-keyed exchange — measured 300-420 MB of
      // vectors/shingles per dense audit query at sf0.1, 60-75% of their
      // shuffle — and buffers them in an aggregation; the joins let AQE
      // broadcast the candidate-restricted perId slice (the common
      // case), so the pair list is often never exchanged at all, and a
      // too-big perId still crosses the wire once per endpoint under
      // SMJ/SHJ. The cost is that perId appears twice in the plan; for
      // raw-column payloads (embedding vectors) or pair volumes that
      // dwarf the per-id table (sign-LSH fat buckets, SemDeDup probe
      // cells, word-gram banding) the saved exchange wins by 25-40%
      // measured; the callers where the duplicated derivation would
      // dominate pass `grouped = true` instead.
      cand.select(col("id_a"), col("id_b"))
        .join(perId.select(col("id").as("id_a"), col("p").as("p_a")), "id_a")
        .join(perId.select(col("id").as("id_b"), col("p").as("p_b")), "id_b")
        .select("id_a", "id_b", "p_a", "p_b")
    }

  /** Lowercase, trim, collapse whitespace — canonical text form. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact dedup: keep the smallest id per normalized text (deterministic
    * survivor, unlike dropDuplicates). One hash-agg shuffle. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(normalize(col(textCol)).as("norm_text"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "norm_text", "n_copies")

  /** Word-k-gram shingles of a space-tokenized document (distinct). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(transform(
          slice(toks, lit(1), greatest(size(toks) - (k - 1), lit(1))),
          (_, i) => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Character k-gram shingles of a document (distinct) — the standard
    * alternative to word shingles for scripts without word boundaries
    * and for short texts where word grams are too sparse. */
  def charShingles(text: Column, k: Int = 5): Column =
    array_distinct(
      when(length(text) < k, array(text))
        .otherwise(transform(
          sequence(lit(1), length(text) - (k - 1)),
          i => text.substr(i, lit(k)))))

  /** Exact n-gram Jaccard similarity pairs >= threshold over WORD
    * k-grams; [[jaccardPairsChar]] is the character-gram form.
    *
    * Implementation: explode distinct shingles, self-join on shingle
    * (bounded by shingle posting-list sizes — at web scale you'd first
    * drop ultra-common shingles, which `maxDocFreq` does), count
    * intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    *
    * `relativeCap` (default on) tightens the df cap to 1% of the corpus
    * (floor 16): shingles above the cap are dropped from intersection
    * counts while denominators keep full set sizes, so reported scores
    * are a conservative underestimate whenever the cap binds — the
    * standard boilerplate-shingle discard (near-universal word k-grams
    * carry no similarity signal). Audits that pin LSH output against
    * TRUE Jaccard pass `relativeCap = false`. */
  def jaccardPairs(
      df: DataFrame,
      threshold: Double,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Long = 10000L,
      relativeCap: Boolean = true): DataFrame =
    jaccardFromShingles(
      widen(df).select(col(idCol).as("id"),
        shingles(normalize(col(textCol)), k).as("sh")),
      threshold, maxDocFreq, relativeCap)

  /** Exact character-n-gram Jaccard pairs (same machinery, char grams).
    * No corpus-relative df cap here, deliberately: char k-grams are
    * inherently high-frequency (common 5-grams appear in most documents
    * of a natural-language corpus), so a 1% df cap would strip the bulk
    * of every doc's gram set and gut the metric rather than trim
    * boilerplate. The char-gram scale path is banding
    * ([[minhashLshPairsChar]]), not df capping — this exact form is for
    * bounded slices (cf. q55's short-doc restriction). */
  def jaccardPairsChar(
      df: DataFrame,
      threshold: Double,
      k: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Long = 10000L): DataFrame =
    jaccardFromShingles(
      widen(df).select(col(idCol).as("id"),
        charShingles(normalize(col(textCol)), k).as("sh")),
      threshold, maxDocFreq, relativeCap = false)

  /** Exact n-gram CONTAINMENT pairs: |A∩B| / min(|A|,|B|) >= threshold
    * over word k-gram shingle sets (Broder 1997's containment, the
    * resemblance measure's asymmetric sibling). Catches near-SUPERSET
    * duplication that Jaccard structurally cannot: a snippet embedded in
    * a longer document scores containment ~1.0 but Jaccard ~|A|/|B|, so
    * a 3x-longer superset doc hides from a 0.5 Jaccard gate forever.
    * Quote-heavy web corpora and chunk-then-recombine pipelines produce
    * exactly this shape, and the shorter side is the doc a dedup pass
    * should drop (it adds no novel text).
    *
    * Same grouped posting-list machinery, df caps, and scale bounds as
    * [[jaccardPairs]] — only the final score differs, so the pair
    * fan-out guarantees are identical. */
  def containmentPairs(
      df: DataFrame,
      threshold: Double,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Long = 10000L,
      relativeCap: Boolean = true): DataFrame =
    pairsFromShingles(
      widen(df).select(col(idCol).as("id"),
        shingles(normalize(col(textCol)), k).as("sh")),
      threshold, maxDocFreq, relativeCap,
      (i, sa, sb) => i / least(sa, sb), "containment")

  /** Shared pair-generation core over a pre-shingled `(id, sh)` frame.
    *
    * With `relativeCap` on, the df filter tightens `maxDocFreq` to 1% of
    * the corpus (floor 16): pair fan-out is O(Σ df²), and an absolute
    * cap alone never binds on small-to-mid corpora, letting every common
    * shingle contribute its full df². The bound is computed LAZILY as a
    * one-row aggregate broadcast into the filter (constructing the frame
    * must not launch Spark jobs), with integer arithmetic
    * (`(n+99) div 100`) the DuckDB oracles reproduce exactly. The
    * CappedCollect buffer stays at the absolute `maxDocFreq` — it is the
    * memory guard; the relative cap is the fan-out guard. */
  private def jaccardFromShingles(
      shingled: DataFrame,
      threshold: Double,
      maxDocFreq: Long,
      relativeCap: Boolean): DataFrame =
    pairsFromShingles(shingled, threshold, maxDocFreq, relativeCap,
      (i, sa, sb) => i / (sa + sb - i), "jaccard")

  /** @param score similarity from (|A∩B|, |A|, |B|) double columns;
    * @param scoreName output column name for the rounded score */
  private def pairsFromShingles(
      shingled: DataFrame,
      threshold: Double,
      maxDocFreq: Long,
      relativeCap: Boolean,
      score: (Column, Column, Column) => Column,
      scoreName: String): DataFrame = {
    val sizes = shingled.withColumn("setsize", size(col("sh")))
    // explode_OUTER, then drop nulls: plain explode makes Catalyst infer a
    // `size(sh)>0 AND isnotnull(sh)` filter (InferFiltersFromGenerate)
    // which alias-substitutes into the FULL shingle expression and pushes
    // below the widen() exchange — re-evaluating the expensive derivation
    // twice on the unsplit scan partition. Outer generate infers nothing;
    // the null filter on the generate output cannot be pushed below it.
    val posts = sizes
      .select(col("id"), col("setsize"), explode_outer(col("sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
    // Pair generation is grouped, NOT a posting-list self-join: a
    // self-join would re-run the whole text→shingle pipeline on both
    // sides (plus once more for the df filter) — 3 scans of the corpus.
    // Instead ONE shuffle groups each shingle's posting list, the df
    // filter is a size() predicate on the grouped array, and pairs come
    // from a double explode. Per-group memory is bounded by maxDocFreq
    // (10⁴ postings ≈ 160 KB).
    //
    // maxDocFreq is the skew guard that makes this survive 100 TB: pair
    // fan-out is O(Σ df²), so one shingle shared by 10⁶ docs would alone
    // emit ~5×10¹¹ pairs; capping df at 10⁴ bounds any shingle's
    // contribution to ~5×10⁷ (near-universal shingles are boilerplate
    // and carry no similarity signal anyway).
    // CappedCollect (not collect_list + filter): bounds every aggregation
    // buffer at maxDocFreq+1 elements so a pathological hot shingle can't
    // assemble a multi-GB list before the size filter discards it
    // clamp, don't toInt: a Long cap above Int.MaxValue would wrap
    // negative and silently collect nothing
    val capped = udaf(new graft.functions.CappedCollect(
      math.min(maxDocFreq, Int.MaxValue - 1L).toInt))
    val grouped0 = byKey(posts, col("shingle")).groupBy("shingle")
      .agg(capped(col("id"), col("setsize").cast("long")).as("docs"))
    val grouped =
      if (relativeCap) {
        // one row; the count branch prunes the shingle projection away,
        // so it costs a scan of the input, not a second shingling pass
        val capDf = shingled.agg(expr(
          s"least(${maxDocFreq}L, greatest(16L, (count(1) + 99) div 100)) AS __cap"))
        grouped0.crossJoin(broadcast(capDf))
          .filter(size(col("docs")).between(lit(2), col("__cap")))
          .drop("__cap")
      } else grouped0.filter(size(col("docs")).between(2, maxDocFreq))
    val inter = grouped
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("size_a"), col("b.v").as("size_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn(scoreName,
        round(score(col("inter").cast("double"),
          col("size_a").cast("double"), col("size_b").cast("double")), 6))
      .filter(col(scoreName) >= threshold)
      .select("id_a", "id_b", scoreName)
  }

  /** Exact Jaccard pairs with AT LEAST ONE endpoint in a deterministic
    * idHash probe slice (`xxhash64(id) % probeDenom == 0`), uncapped —
    * the scale-bounded ground truth for recall gates (q85).
    *
    * Why probe-side (one-sided) sampling and not a two-sided doc sample:
    * near-dup pairs grow LINEARLY with the corpus, so a uniform slice of
    * s docs retains only s²/n of them — the gate goes vacuous exactly as
    * data grows. A fixed-size probe slice instead measures "were the
    * probes' true partners found?", whose expected pair count is
    * scale-invariant (probes × pairs-per-doc).
    *
    * Why it scales where [[jaccardPairs]] uncapped cannot: the pair
    * generator is a probe-postings ⋈ corpus-postings JOIN on shingle, so
    * cost is Σ_sh df_probe(sh)·df(sh) ≤ |probe docs| · Σ df — linear in
    * the corpus — instead of the grouped generator's O(Σ df²), and no
    * full posting list is ever buffered (no CappedCollect; a hot shingle
    * is just a skewed join key, which AQE splits). The probe side is
    * tiny (~probe docs × shingles/doc) so AQE broadcasts it and the
    * corpus is scanned once per side.
    *
    * `probeDenom = 1` makes every doc a probe and reproduces
    * [[jaccardPairs]] with `maxDocFreq = Long.MaxValue, relativeCap =
    * false` exactly (pinned in SketchRecallSpec). */
  def jaccardProbePairs(
      df: DataFrame,
      threshold: Double,
      probeDenom: Long,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(probeDenom >= 1, s"probeDenom must be >= 1, got $probeDenom")
    def posts(frame: DataFrame, suffix: String) =
      frame
        .select(col("id"), size(col("sh")).as("setsize"),
          explode_outer(col("sh")).as("shingle"))
        .filter(col("shingle").isNotNull)
        .select(col("id").as(s"id_$suffix"),
          col("setsize").as(s"size_$suffix"), col("shingle"))
    val shingled = widen(df).select(col(idCol).as("id"),
      shingles(normalize(col(textCol)), k).as("sh"))
    val corpus = posts(shingled, "c")
    val probes = posts(
      shingled.filter(pmod(xxhash64(col("id")), lit(probeDenom)) === 0), "p")
    probes.join(corpus, "shingle")
      .filter(col("id_p") =!= col("id_c"))
      // each unordered pair exactly once: a probe-nonprobe pair has one
      // generation (probe side fixed); a probe-probe pair has two — keep
      // the id_p < id_c orientation
      .filter(pmod(xxhash64(col("id_c")), lit(probeDenom)) =!= 0 ||
        col("id_p") < col("id_c"))
      .groupBy(
        least(col("id_p"), col("id_c")).as("id_a"),
        greatest(col("id_p"), col("id_c")).as("id_b"),
        when(col("id_p") < col("id_c"), col("size_p"))
          .otherwise(col("size_c")).as("size_a"),
        when(col("id_p") < col("id_c"), col("size_c"))
          .otherwise(col("size_p")).as("size_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------- MinHash

  private val P = 1000000007L

  /** MinHash signature from a column of ALREADY-HASHED shingles (longs):
    * array of `numHashes` minima of affine permutations. Fixed
    * coefficients ⇒ deterministic. Taking the hashed column (rather than
    * hashing inside) matters for the plan: the xxhash64 pass runs once in
    * its own projection instead of being re-expanded inside each of the
    * `numHashes` HOF trees (HOFs defeat common-subexpression elimination). */
  def minhashSignature(hashedCol: Column, numHashes: Int = 32): Column =
    // native single-pass expression — the HOF formulation
    // (numHashes × array_min(transform(...))) traversed the hashed array
    // 2×numHashes times, interpreted; see graft.functions.MinHashSig
    graft.functions.SketchExprs.minhashSig(hashedCol, numHashes)

  /** xxhash64 of every shingle, mod P (the minhash base domain). */
  def hashShingles(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(P)))

  /** Near-dup pairs via MinHash-LSH banding + exact Jaccard verification.
    *
    * bands × rowsPerBand = signature length. Candidates are pairs sharing
    * any full band (one explode + groupBy per document, self-join within
    * buckets), then verified with exact shingle-set Jaccard so the output
    * has no false positives. Probabilistic recall (LSH can miss pairs
    * near the threshold) — the standard web-scale tradeoff.
    */
  def minhashLshPairs(
      df: DataFrame,
      threshold: Double,
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    minhashLshFromShingler(df, threshold,
      t => shingles(normalize(t), k),
      // fused native signer (bit-identical to the shingle→hash→sig
      // projection chain, pinned in GraftFunctionsSpec): one boundary
      // scan + one hash per gram — no token array, no gram-string
      // array, no hashed array per document
      t => graft.functions.SketchExprs.wordGramMinhash(
        normalize(t), k, bands * rowsPerBand),
      bands, rowsPerBand, idCol, textCol, groupedRehydrate = false)

  /** MinHash-LSH over CHARACTER k-grams — the scale path for char-level
    * near-dup detection: exact char-gram Jaccard ([[jaccardPairsChar]])
    * is O(Σ df²) and natural-language corpora share so many char grams
    * that nearly every doc pair co-occurs somewhere; banding keeps the
    * candidate set proportional to true near-dups instead. */
  def minhashLshPairsChar(
      df: DataFrame,
      threshold: Double,
      k: Int = 5,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    minhashLshFromShingler(df, threshold,
      t => charShingles(normalize(t), k),
      // fused native signer: one sliding-window pass per doc — no gram
      // array, no array_distinct (min ignores duplicates), no separate
      // hash projection. Char corpora emit ~n_chars grams per doc, so
      // the materialized-array path triples the allocation bill exactly
      // where gram counts are largest.
      t => graft.functions.SketchExprs.charGramMinhash(
        normalize(t), k, bands * rowsPerBand),
      bands, rowsPerBand, idCol, textCol, groupedRehydrate = true)

  /** @param shingler gram-set builder used by the EXACT verification
    *   stage (restricted to candidates)
    * @param signer whole-signature builder text → array<long> used for
    *   banding — either the shingle→hash→MinHashSig projection chain or
    *   a fused native expression */
  private def minhashLshFromShingler(
      df: DataFrame,
      threshold: Double,
      shingler: Column => Column,
      signer: Column => Column,
      bands: Int,
      rowsPerBand: Int,
      idCol: String,
      textCol: String,
      // verification rehydration shape (see rehydratePairs): char grams
      // pass true — their shingler is the dominant per-candidate cost,
      // so it must evaluate exactly once — word grams false (pair volume
      // dominates; the join shape's saved payload exchange wins)
      groupedRehydrate: Boolean): DataFrame = {
    val wide = widen(df)
    val banded = bandedMinhash(wide, signer, bands, rowsPerBand, idCol, textCol)
    val cand = bucketPairs(banded.withColumn("isb", lit(0L)), requireFlagged = false)
    verifyJaccardPairs(
      cand, wide.select(col(idCol).as("id"), col(textCol).as("__txt")),
      shingler, threshold, groupedRehydrate)
  }

  /** (id, band, bucket) band postings of a MinHash signature. The
    * signature lands in its own projection so the banding pass references
    * a materialized column (CollapseProject keeps non-cheap
    * multi-referenced expressions un-inlined); only (id, band, bucket)
    * flows downstream — at 100 TB the shuffle payload is 3 longs per
    * (doc, band), never the shingle arrays themselves. */
  private def bandedMinhash(
      wide: DataFrame,
      signer: Column => Column,
      bands: Int,
      rowsPerBand: Int,
      idCol: String,
      textCol: String): DataFrame =
    wide
      .select(col(idCol).as("id"), signer(col(textCol)).as("sig"))
      .select(
        col("id"),
        // outer generate: plain posexplode would infer a size>0 filter
        // over the whole sig expression and push it below the widen
        // exchange (see jaccardPairs) — re-running minhash on one core.
        // A null signature (null text) gets NO postings: without the
        // isNotNull guard, concat_ws over a null slice yields "" and
        // every null-text doc lands in ONE xxhash64("")-bucket per band
        // — a hot-bucket skew hazard whose pairs could never survive
        // exact verification anyway.
        posexplode_outer(when(col("sig").isNotNull, transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      .filter(col("bucket").isNotNull)

  /** Candidate pairs from band postings `(id, band, bucket, isb)` via
    * bucket grouping, not a self-join: a self-join would run the
    * shingle→hash→signature pipeline TWICE. One shuffle groups ids per
    * (band, bucket); pairs explode from the grouped list. A bucket with
    * b ids emits b² pairs, so bucket size is capped like jaccardPairs
    * caps df (an over-full LSH bucket means the band hash carries no
    * discriminating signal). The `isb` payload rides the capped collect;
    * with `requireFlagged` only pairs where at least one side is flagged
    * survive — the incremental path's "touches the new batch" filter.
    * Shared with the embedding-LSH family (same shape, (table, sig)
    * renamed to (band, bucket)). */
  /** The incremental-family SLICE construction, shared by
    * [[incrementalMinhashPairs]] /
    * [[Similarity.incrementalCosineDupPairs]] /
    * [[Similarity.incrementalSemanticDupPairs]]: semi-join the
    * persisted postings down to the (band, bucket) keys the signed
    * batch touches (the probe side broadcasts under AQE; the index is
    * scanned columnar, never shuffled), then union BEFORE grouping so a
    * touched bucket sees its FULL membership — bucket sizes, and
    * therefore the over-full-bucket cap, bind identically to the full
    * run. That union-before-grouping ordering is the one subtlety every
    * family must get right, which is why it lives in exactly one place.
    * Both inputs are `(id, band, bucket)` postings; output is the
    * deduped candidate pairs with at least one batch side. */
  private[ops] def incrementalCandidates(
      batchBanded: DataFrame,
      index: DataFrame,
      cap: Int = 10000): DataFrame = {
    val probeKeys = batchBanded.select("band", "bucket").distinct()
    val touched = index.select(col("id"), col("band"), col("bucket"))
      .join(probeKeys, Seq("band", "bucket"), "left_semi")
    val banded = touched.withColumn("isb", lit(0L))
      .unionByName(batchBanded.select(col("id"), col("band"), col("bucket"))
        .withColumn("isb", lit(1L)))
    bucketPairs(banded, requireFlagged = true, cap = cap)
  }

  private[ops] def bucketPairs(
      banded: DataFrame, requireFlagged: Boolean, cap: Int = 10000): DataFrame = {
    val capped = udaf(new graft.functions.CappedCollect(cap))
    val exploded = byKey(banded, col("band"), col("bucket")).groupBy("band", "bucket")
      .agg(capped(col("id"), col("isb")).as("ids")) // bounded buffer, see CappedCollect
      .filter(size(col("ids")).between(2, cap))
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a.id") < col("b.id"))
    val flagged =
      if (requireFlagged) exploded.filter(col("a.v") + col("b.v") > 0)
      else exploded
    flagged
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact-Jaccard verification of candidate pairs: rehydrate the
    * (deduped, small) candidate list with shingle sets derived ONLY for
    * candidate docs — see [[rehydratePairs]] for the shape. `texts` is
    * `(id, __txt)` for every id a candidate pair may reference. */
  private def verifyJaccardPairs(
      cand: DataFrame,
      texts: DataFrame,
      shingler: Column => Column,
      threshold: Double,
      groupedRehydrate: Boolean): DataFrame = {
    val candDocs = restrictToCandidates(texts, cand)
      .select(col("id"), shingler(col("__txt")).as("p"))
    rehydratePairs(cand, candDocs, groupedRehydrate)
      .withColumnRenamed("p_a", "sh_a").withColumnRenamed("p_b", "sh_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------- incremental ingest dedup

  /** Persistable MinHash band index of a corpus: `(id, band, bucket)` —
    * the exact band postings [[minhashLshPairs]] computes internally,
    * exposed so they can be stored once and probed on every ingest.
    *
    * 100 TB contract: signing is the expensive pass (reads every text
    * byte); the index is 3 longs × bands per document (~0.1% of a text
    * corpus's bytes). Build it once, append each ingested batch's
    * postings (`minhashBandIndex(batch, ...)` — same parameters!) after
    * the batch is accepted, and feed it to [[incrementalMinhashPairs]]
    * so per-ingest near-dup detection re-signs only the batch and scans
    * only the tiny index, never the corpus texts. Deletes remove the
    * id's rows. (The config-driven persistence —
    * [[graft.sink.BucketedMergeSink.syncMinhashIndex]] — stores these
    * rows nested one-row-per-id in a bucketed layout and flattens them
    * back via `readPostings`, so maintenance stays bucket-pruned; the
    * probe contract here is the flat frame either way.)
    * Parameters (k, bands, rowsPerBand, charGrams) are part
    * of the index's identity — probing with different ones is undefined.
    *
    * @param charGrams sign character k-grams (the [[minhashLshPairsChar]]
    *   family, default k there is 5) instead of word k-grams */
  def minhashBandIndex(
      df: DataFrame,
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
      charGrams: Boolean = false): DataFrame = {
    val signer: Column => Column =
      if (charGrams)
        t => graft.functions.SketchExprs.charGramMinhash(normalize(t), k, bands * rowsPerBand)
      else
        t => graft.functions.SketchExprs.wordGramMinhash(normalize(t), k, bands * rowsPerBand)
    bandedMinhash(widen(df), signer, bands, rowsPerBand, idCol, textCol)
  }

  /** Near-dup pairs an ingested `batch` forms with an already-loaded
    * corpus AND within itself, WITHOUT re-signing the corpus: the batch
    * is signed and banded ([[minhashBandIndex]] machinery), the
    * persisted `index` is semi-joined down to the (band, bucket) keys
    * the batch touches, and the full-run candidate+verification
    * machinery runs on that touched slice — so the result is exactly
    * `minhashLshPairs(corpus ∪ batch, ...)` restricted to pairs with at
    * least one batch side, bucket caps included (pinned in
    * DedupPropertySpec; q114 audits it in-battery).
    *
    * Scale shape (the reason this exists): a 100 TB corpus cannot be
    * re-signed on every 1 TB ingest. Here the text-reading passes are
    * O(batch) for signing plus O(candidate partners) for verification
    * (corpus texts are semi-joined to candidate ids BEFORE shingling —
    * against a [[graft.sink.BucketedMergeSink]] target that read is
    * `readForKeys`-shaped); the only O(corpus)-proportional work is one
    * columnar scan of the 3-long index, whose probe side (the batch's
    * distinct band keys) broadcasts under AQE. Shuffled bytes are the
    * touched slice, not the index.
    *
    * `corpus` supplies partner texts `(idCol, textCol)` for
    * verification; ids must be unique across `corpus ∪ batch`, and
    * `index` must be the PRE-ingest index built with identical
    * parameters. */
  def incrementalMinhashPairs(
      batch: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      threshold: Double,
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
      charGrams: Boolean = false): DataFrame = {
    val shingler: Column => Column =
      if (charGrams) t => charShingles(normalize(t), k)
      else t => shingles(normalize(t), k)
    val batchBanded = minhashBandIndex(
      batch, k, bands, rowsPerBand, idCol, textCol, charGrams)
    val cand = incrementalCandidates(batchBanded, index)
    val texts = corpus.select(col(idCol).as("id"), col(textCol).as("__txt"))
      .unionByName(batch.select(col(idCol).as("id"), col(textCol).as("__txt")))
    // grouped rehydration: the incremental candidate list is
    // slice-bounded (O(touched buckets)), so the payload-bearing pair
    // exchange is small while the duplicated shingler would not be
    verifyJaccardPairs(cand, texts, shingler, threshold, groupedRehydrate = true)
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token multiset: bit i of the hash is set when the
    * sum over token occurrences of (±1, sign = bit i of xxhash64(token))
    * is positive. Pure higher-order-function fold — no UDF, no explode.
    * Each occurrence contributes ±1 directly, so the fold is O(64·n) per
    * document (no distinct-token recount, which would be O(distinct·n)). */
  def simhash(text: Column): Column =
    // native one-pass expression with 64 on-stack counters — the HOF
    // fold allocated a 64-long array + index array per TOKEN, interpreted
    // (graft.functions.SimHash64; hashes bit-identical to xxhash64)
    graft.functions.SketchExprs.simhash64(split(text, " "))

  /** Near-dup pairs with SimHash hamming distance <= maxHamming, found by
    * 4×16-bit band blocking (pigeonhole: distance <= 3 guarantees at least
    * one identical band) + exact bit_count verification. */
  def simhashPairs(
      df: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4-band blocking guarantees recall only for distance <= 3")
    val hashed = widen(df).select(col(idCol).as("id"), simhash(normalize(col(textCol))).as("sh"))
    val banded = hashed.select(
      col("id"), col("sh"),
      // outer: avoid the inferred size>0 filter re-running simhash below
      // the widen exchange (see jaccardPairs)
      posexplode_outer(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sh"), (b * 16).cast("int"))
          .bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
      .filter(col("bucket").isNotNull)
    // bucket grouping instead of a self-join (which would compute every
    // document's simhash twice). The 64-bit hash rides along in the
    // grouped list, so verification is pure bit_count on the exploded
    // pair — no re-join against the corpus at all.
    val capped = udaf(new graft.functions.CappedCollect(10000))
    byKey(banded, col("band"), col("bucket")).groupBy("band", "bucket")
      .agg(capped(col("id"), col("sh")).as("ds")) // bounded buffer, see CappedCollect
      .filter(size(col("ds")).between(2, 10000))
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.v").bitwiseXOR(col("b.v"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- cluster assignment

  /** Connected components over an undirected edge list `(id_a, id_b)` →
    * `(id, component)` where component = min id reachable (SURVEY §7
    * "near-dup connected components").
    *
    * Min-label propagation: each node adopts the smallest label among
    * itself and its neighbours, iterated to fixpoint. Iteration count is
    * bounded by the component diameter — near-dup graphs are dense
    * clique-ish clusters (diameter 2-3), not long chains, so a handful of
    * rounds converge. Each round is one shuffle (join + groupBy on id);
    * an eager `localCheckpoint` truncates the logical plan (unbounded
    * lineage would blow up Catalyst analysis exponentially) and the
    * superseded round's checkpoint blocks are freed explicitly, so
    * iteration storage is exactly two label snapshots — the
    * lineage-vs-storage management SURVEY §7 calls out as the hard part
    * of surviving iteration at 100 TB.
    */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // cache sym PRE-PARTITIONED on the join key (r17 optimization): the
    // per-round join re-reads sym every iteration, and an InMemoryRelation
    // REMEMBERS its partitioning (Spark leaves cached-plan output
    // partitioning unchanged by default), so the dst-side exchange is
    // paid once here instead of once per round. Width = live cluster
    // parallelism, the byKey rationale: the per-round work is a bounded
    // label join, and iteration rounds are where task-count overhead
    // multiplies.
    val sym = byKey(edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst"))),
      col("dst"))
      .cache()
    var checkpointed = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var labels: DataFrame = checkpointed
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy("src").agg(min("component").as("nc"))
      // localCheckpoint is load-bearing here: it truncates the LOGICAL
      // plan each round — with plain persist the round-N plan embeds the
      // whole round-1..N-1 tree and Catalyst work grows exponentially
      // (a 10-round chain OOMs the driver on plan analysis alone). The
      // eager checkpoint also materializes the snapshot, so the PREVIOUS
      // round's blocks can be freed immediately below (the Dataset API
      // alone can't unpersist checkpoint storage — GraftSqlBridge reaches
      // the backing RDD): exactly two label snapshots are ever resident.
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(labels("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nc"), col("component")))
            .as("component"))
        .localCheckpoint()
      converged = next.filter(col("component") =!= col("prev")).isEmpty
      org.apache.spark.sql.GraftSqlBridge.checkpointRdd(checkpointed)
        .foreach(_.unpersist(blocking = false))
      checkpointed = next
      labels = next.select("id", "component")
      iter += 1
    }
    sym.unpersist()
    // fail loud: silently returning split components would diverge from
    // any exact reference (q50's recursive-CTE oracle) with no signal
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds — " +
        "a component's diameter exceeds maxIter; raise maxIter")
    labels
  }

  /** Doc → cluster-representative assignment over a whole corpus: docs
    * joined in near-dup `pairs` share their component's min id as
    * `cluster`; isolated docs are their own cluster. The output is what a
    * dedup pipeline actually consumes (keep rows where
    * doc_id == cluster), unlike the raw pair list. */
  def dedupClusters(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs.select("id_a", "id_b"))
    df.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster"))
  }

  /** Survivor selection over near-dup clusters with SOURCE PRIORITY:
    * real dedup pipelines don't keep an arbitrary cluster member, they
    * keep the copy from the most trusted source (curated > crawled,
    * canonical > mirror). `priority` lists source names best-first;
    * unlisted sources rank after every listed one; ties (same rank)
    * break on the smallest id, so the default `priority = Nil`
    * degenerates to [[dedupClusters]]' min-id rule. Output: one row per
    * doc with its cluster, the cluster's survivor id, and a `keep` flag.
    *
    * Scale shape: the survivor per cluster is a min AGGREGATE over
    * (rank, id) structs — map-side combinable, so even a degenerate
    * million-member cluster collapses before the shuffle; the flag
    * join-back is against the clusters-sized survivor table (AQE
    * broadcasts it when small, skew-splits a hot cluster otherwise).
    * Never a window over the cluster — its partition would hold every
    * member of the biggest cluster. */
  def keepBestPerCluster(
      df: DataFrame,
      clusters: DataFrame,
      priority: Seq[String] = Nil,
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    val rank = priority.zipWithIndex.foldRight(lit(priority.size): Column) {
      case ((s, i), e) => when(col(sourceCol) === s, lit(i)).otherwise(e)
    }
    val withC = df.select(col(idCol), col(sourceCol))
      .join(clusters.select(col(idCol), col("cluster")), Seq(idCol))
      .withColumn("__rank", rank)
    val best = withC.groupBy("cluster")
      .agg(min(struct(col("__rank"), col(idCol))).as("b"))
      .select(col("cluster"), col("b").getField(idCol).as("survivor_id"))
    withC.join(best, "cluster")
      .select(col(idCol), col("cluster"), col("survivor_id"),
        (col(idCol) === col("survivor_id")).as("keep"))
  }

  /** Cross-document duplicate-SPAN removal (the sub-document complement
    * of whole-doc dedup): delete every token covered by a word k-gram
    * that already occurred earlier in the corpus, keeping the first
    * occurrence. This is the public "dedup repeated substrings, keep one
    * copy" recipe (Lee et al. 2022, arXiv:2107.06499) with the suffix
    * array replaced by a fixed-width k-gram pass — the form that runs as
    * three hash shuffles on Spark instead of a global suffix sort.
    *
    * Semantics (deterministic): the occurrence of a k-gram at 1-based
    * token position p in doc d covers tokens p..p+k-1. Occurrences of a
    * gram are ordered by (doc_id, pos); every occurrence after the first
    * is a duplicate, and a token covered by ≥1 duplicate occurrence is
    * removed. Output: one row per input doc with the surviving tokens
    * rejoined (`cleaned_text`, '' when everything was removed), the
    * original token count and the removed-token count. Docs shorter than
    * k tokens have no grams and pass through unchanged.
    *
    * Scale shape: tokens explode to one gram row each (n-k+1 per doc);
    * the first-occurrence table is an AGGREGATE per gram
    * (min_by(struct(doc,pos)), map-side combinable — deliberately NOT a
    * window over the gram: a boilerplate gram's window partition would
    * hold every copy in the corpus, same reasoning as
    * [[graft.ops.TrainingPrep]]'s decontamination). Duplicate occurrences
    * join that one-row-per-gram table back (AQE handles a skewed hot
    * gram), covered positions explode k-wide from DUPLICATE occurrences
    * only, and the rebuild is one groupBy(doc) over surviving tokens.
    * Grams travel as exact strings, not hashes: a hash collision would
    * silently delete non-duplicate text, the one failure mode a dedup
    * pass must never have. At 100 TB the gram strings are bounded
    * (k·avg-word) and the gram shuffle is the same width as the
    * decontamination pass the pipeline already runs. */
  def removeDuplicateSpans(
      df: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = widen(df).select(
      col(idCol).as("id"), split(normalizeKeepCase(col(textCol)), " ").as("toks"))
    // one row per token occurrence (pos is 1-based)
    val tok = toks.select(col("id"), posexplode(col("toks")))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("token"))
    // one row per gram occurrence: gram at p = tokens p..p+k-1
    val occ = toks
      .filter(size(col("toks")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(k))))))
      .select(col("id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    // first corpus occurrence of each gram — an aggregate, not a window
    val first = occ.groupBy("gram")
      .agg(min(struct(col("id"), col("pos"))).as("f"))
      .select(col("gram"), col("f.id").as("f_id"), col("f.pos").as("f_pos"))
    // duplicate occurrences: everything that is not the first
    val dup = occ.join(first, "gram")
      .filter(!(col("id") === col("f_id") && col("pos") === col("f_pos")))
    // token positions covered by >=1 duplicate occurrence
    val covered = dup
      .select(col("id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val kept = tok.join(covered, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          s => s.getField("token"))).as("cleaned_text"),
        count(lit(1)).as("n_kept"))
    toks.select(col("id"), size(col("toks")).as("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("int").as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Whitespace trim/collapse WITHOUT lowercasing — span removal must
    * reproduce surviving text verbatim, so its canonical form only
    * normalizes separators (tokens keep their case). */
  private[ops] def normalizeKeepCase(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))
}
