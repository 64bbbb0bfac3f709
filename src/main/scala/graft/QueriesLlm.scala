package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis, TrainingPrep}

/** Layer C query battery: the LLM-training-data operators (dedup,
  * similarity search, multimodal, text analysis). Exact/deterministic
  * operators carry full SQL oracles; the sketch-based ones (MinHash-LSH,
  * SimHash, LSH-ANN) are deterministic but not SQL-expressible, so the
  * driver records rows-only checks for them.
  */
object QueriesLlm {

  /** Content fingerprint of one testdata table (total bytes + newest
    * mtime of its files) — the same identity the bench report records,
    * so a regenerated corpus invalidates every ground-truth cache entry
    * keyed on it. */
  private def tableFp(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    val files = (if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
    else Seq(f)).filter(_.isFile)
    s"${files.map(_.length).sum}-${if (files.isEmpty) 0L else files.map(_.lastModified).max}"
  }

  /** Persist-once cache for the recall gate's DETERMINISTIC exact
    * ground truth (r10 verdict ask #3): q85's exact siblings are pure
    * functions of (table content, probe slice, config), yet the bench
    * re-ran them in all 3 battery passes AND all 3 isolated-JVM passes —
    * ~5/6 of the gate's cost spent recomputing a constant. The first
    * evaluation writes the frame to a tmp-dir parquet keyed by
    * (op, config, content fingerprint); every later pass — in THIS JVM
    * or a fresh one — reads it back. The cache can never go stale
    * (content-fingerprint key) and never changes results (the sibling
    * is deterministic; on any cache failure the computation simply runs
    * as before). Publish is atomic (write `key.tmp-<uuid>`, rename to
    * `key`): a concurrent creator loses the rename and reads the
    * winner's copy. `SPARK_GRAFT_GT_CACHE=0` disables.
    *
    * The APPROXIMATE operators under audit are memoized separately and
    * more conservatively — in-JVM only, see [[memoApprox]] — so a code
    * change can never be masked by a stale cross-process cache. */
  private[graft] def cachedGroundTruth(s: SparkSession, key: String)(
      compute: => DataFrame): DataFrame = {
    if (sys.env.get("SPARK_GRAFT_GT_CACHE").contains("0")) return compute
    persistOnce(s, new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-gt-cache"),
      key)(compute)
  }

  /** Compute-once-read-forever parquet cache under `base/key` with an
    * atomic publish and an empty-frame schema sidecar — the shared
    * machinery behind [[cachedGroundTruth]] (cross-JVM) and
    * [[memoApprox]] (pid-scoped). */
  private def persistOnce(s: SparkSession, base: java.io.File, key: String)(
      compute: => DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val dir = new java.io.File(base, key)
    // an empty exact set writes no parquet part files (Spark skips empty
    // partitions), so the schema travels in a sidecar and an empty cache
    // hit reconstructs the empty frame from it
    def readIt(): Option[DataFrame] =
      try {
        if (!new java.io.File(dir, "_SUCCESS").isFile) None
        else {
          val sf = new java.io.File(dir, "_graft_schema.json")
          if (!sf.isFile) None
          else {
            val schema = DataType.fromJson(
              new String(java.nio.file.Files.readAllBytes(sf.toPath), "UTF-8"))
              .asInstanceOf[StructType]
            val hasParts = Option(dir.listFiles()).getOrElse(Array.empty)
              .exists(f => f.getName.startsWith("part-") && f.length > 0)
            if (hasParts) Some(s.read.schema(schema).parquet(dir.toString))
            else Some(s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
          }
        }
      } catch { case _: Throwable => None }
    readIt().getOrElse {
      val df = compute
      try {
        base.mkdirs()
        val tmp = new java.io.File(base,
          s"$key.tmp-${java.util.UUID.randomUUID()}")
        df.write.parquet(tmp.toString)
        java.nio.file.Files.write(
          new java.io.File(tmp, "_graft_schema.json").toPath,
          df.schema.json.getBytes("UTF-8"))
        if (!tmp.renameTo(dir)) { // lost a publish race: read the winner
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
          }
          rm(tmp)
        }
        readIt().getOrElse(df)
      } catch { case _: Throwable => df }
    }
  }

  /** In-JVM memo for the recall gate's APPROXIMATE sides (r14 verdict
    * ask #5): the five operators under audit are deterministic
    * functions of (corpus content, config) — fixed hash seeds, fixed
    * hyperplanes, deterministic k-means init — yet the bench's
    * warmup + N passes recomputed each of them every pass, ~5/6 of the
    * entry's per-pass cost spent re-deriving constants. Each side now
    * materializes ONCE per JVM (a launch-scoped scratch parquet —
    * bounded: pair/top-k frames, never signatures) and later passes
    * reuse it.
    *
    * Deliberately PROCESS-LOCAL, unlike [[cachedGroundTruth]]'s
    * cross-JVM cache: the memo caches the MEASURED side, and a
    * cross-process cache keyed only on (content, config) could serve
    * results computed by OLD code after an operator change — masking
    * exactly the recall regression the gate exists to catch. Same
    * process = same code, so the memo can never go stale. Each
    * operator's runtime cost stays measured by its own battery entry
    * (q42/q52/q49/q53/q103); the audit re-measuring it N more times
    * was triple-counting, not coverage.
    *
    * Storage is a launch-scoped scratch parquet
    * ([[Tables.launchScratchPath]] — swept at process exit), NOT
    * localCheckpoint: the bench evicts every persistent RDD block
    * between timed queries (Bench.onePass), which would strand a
    * checkpointed memo as CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the
    * second pass. A parquet read-back plan survives any block-manager
    * eviction. Launch-scoped — a per-launch nonce plus a strong hash
    * of the FULL key (r15 advice) — because pid alone leaves two
    * stale-read holes: a SIGKILL skips the shutdown sweep and a later
    * JVM recycling the pid could read sides computed by OLD code, and
    * the old 32-bit `String.hashCode` key let distinct configs
    * collide onto one dir. */
  private def memoApprox(s: SparkSession, key: String)(
      compute: => DataFrame): DataFrame = {
    val path = new java.io.File(Tables.launchScratchPath("graft-apxmemo", key))
    persistOnce(s, path.getParentFile, path.getName)(compute)
  }

  /** The normalized token stream the heavy-hitter audits profile. */
  private def normalizedTokens(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(split(Dedup.normalize(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** The two Misra–Gries invariants as a violations relation (empty =
    * green), shared by q128 (Column API) and q131 (SQL surface). `sk`
    * carries (tok, est); for every token with true count `t` over `n`
    * inputs: carried estimates sit in [t - n/(cap+1), t], and every
    * token with t > n/(cap+1) must be present. Holds under ANY merge
    * order — the raw map does not, which is exactly why the battery
    * pins the invariants, never the tail. */
  private def mgAudit(toks: DataFrame, sk: DataFrame, cap: Int): DataFrame = {
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = broadcast(toks.agg(count(lit(1)).as("n")))
    exact.join(sk, Seq("tok"), "full").crossJoin(tot)
      .filter(
        (col("est").isNotNull && (col("cnt").isNull ||
          col("est") > col("cnt") ||
          (col("cnt") - col("est")).cast("double") >
            col("n") / lit(cap + 1.0))) ||
        (col("est").isNull &&
          col("cnt").cast("double") > col("n") / lit(cap + 1.0)))
      .select(col("tok"), lit("hh_violation").as("violation"))
      .orderBy("tok")
  }

  /** Shared ANN-vs-exact audit (q60/q61): emits rank-dominance and
    * score-recomputation violations — both empty for a correct index. */
  private def annAudit(
      ann0: DataFrame, brute: DataFrame, emb: DataFrame): DataFrame = {
    // both audit legs (rank dominance + re-scoring) read the ANN result;
    // checkpoint the k×|queries|-row frame so the index pipeline runs
    // once, not once per union branch
    val ann = ann0.localCheckpoint(true)
    val dom = ann
      .select(col("query_id"), col("rank"), col("cand_id"), col("cos").as("a_cos"))
      .join(brute.select(col("query_id"), col("rank"), col("cos").as("b_cos")),
        Seq("query_id", "rank"))
      .filter(col("a_cos") > col("b_cos"))
      .select(col("query_id"), col("cand_id"),
        lit("rank_dominance").as("violation"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val rescored = ann
      .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        "query_id")
      .join(vecs.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        "cand_id")
      .filter(round(Similarity.cosine(col("qv"), col("cv")), 4) =!= col("cos"))
      .select(col("query_id"), col("cand_id"),
        lit("score_mismatch").as("violation"))
    dom.union(rescored).orderBy("query_id", "cand_id", "violation")
  }

  /** Measured recall of each approximate operator against its exact
    * sibling on the same input: |approx ∩ exact| / |exact| over result
    * keys. The audits (q57–q62) pin PRECISION (no false positives,
    * exact scores); this is the other half — a mis-tuned band/bit/probe
    * choice would pass every precision gate while silently missing most
    * near-dups. One row per operator: (op, recall, floor), recall
    * vacuously 1.0 on an empty exact set.
    *
    * Ground truth is SCALE-BOUNDED (the r8→r9 fix): the pair-op exact
    * siblings were the uncapped O(Σ df²) Jaccard and the O(n²) pairwise
    * cosine over the whole corpus — the right oracle at sf0.1 and
    * unrunnable exactly when the gate matters most. Both now measure
    * recall over the true partners of a deterministic idHash PROBE
    * slice (`xxhash64(id) % denom == 0`, denom sized so the slice is
    * ~500 docs at any corpus size): the approx operator still runs at
    * production config over the FULL corpus, its output restricted to
    * probe-touching pairs, while the exact side computes only the probe
    * docs' partners — linear in the corpus
    * ([[graft.ops.Dedup.jaccardProbePairs]],
    * [[graft.ops.Similarity.cosineProbePairs]]). Probe-side (not
    * two-sided) sampling keeps the expected pair count scale-invariant:
    * pairs grow ~linearly with docs, so a two-sided slice retains only
    * s²/n of them and the gate would go vacuous as data grows. At
    * sf0.01 and below, denom = 1 — every doc is a probe and the gate is
    * bit-identical to the unsampled one. The ANN ground truth
    * (brute-force top-k) needs no sampling: its probes are the fixed
    * query set, already O(|q| · corpus).
    *
    * The floors are deliberately loose lower bounds (the testdata
    * corpus is regenerated every round): measured on sf0.001/sf0.01
    * (denom = 1, full gate) and sf0.1 (denom = 10 probe slice) —
    * minhash_lsh 1.00 everywhere; embed_lsh ~0.76–0.78 (full and
    * probed agree); ann_lsh 0.64–0.80 across per-round corpus draws;
    * ann_ivf ~0.90–0.92 — so typical recall sits well above them,
    * while a configuration regression (halved band count,
    * near-dup-width signatures in a mid-cosine regime — the untuned
    * 12-bit lshTopK measured 0.06 here) drops straight through. */
  def sketchRecall(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val e = Tables.load(s, dir, "embeddings")
    // probe denominators: fixed-size ground-truth slice at any scale
    val probeTarget = 500L
    val dDocs = math.max(1L, docs.count() / probeTarget)
    val dVecs = math.max(1L, e.count() / probeTarget)
    def probeTouching(pairs: DataFrame, denom: Long): DataFrame =
      pairs.filter(
        pmod(xxhash64(col("id_a")), lit(denom)) === 0 ||
          pmod(xxhash64(col("id_b")), lit(denom)) === 0)
    def row(op: String, approx: DataFrame, exact: DataFrame,
        keys: Seq[String], floor: Double): DataFrame = {
      // ONE left join computes both counts, so each (expensive) side's
      // subplan evaluates exactly once — a semi-join + separate total
      // would run the exact pipeline twice. Approx outputs are
      // key-unique (deduped pairs / per-rank candidates), so the left
      // join preserves exact rows 1:1.
      val x = exact.select(keys.map(col): _*)
      val a = approx.select(keys.map(col): _*).withColumn("__hit", lit(1))
      x.join(a, keys, "left")
        .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
        .select(
          lit(op).as("op"),
          when(col("n_exact") === 0, lit(1.0))
            .otherwise(round(col("n_hit").cast("double") / col("n_exact"), 4))
            .as("recall"),
          lit(floor).as("floor"))
    }
    // configs mirror the battery entries exactly (q42/q52/q49/q53); the
    // exact siblings are uncapped for TRUE ground truth (see q57),
    // bounded to the probe slice's partners.
    // 50 gate queries, not the battery entries' 10: recall here is a
    // GATE statistic, and with 10 queries × k=5 the denominator (50
    // pairs) moved the measured value by ~0.15 across testdata
    // regenerations — wider than the band the floor guards. 250 pairs
    // pins the corpus-draw variance so the floor can sit closer to the
    // steady state (the brute sibling stays one broadcast pass; its
    // cost is the shared corpus scan, not the query count).
    val q = e.filter(col("vec_id") < 50)
    // the exact siblings are deterministic ground truth — persisted once
    // per (config, corpus fingerprint) and shared across every bench
    // pass and JVM (see cachedGroundTruth); the approx sides under
    // measurement run fully every time
    val fpDocs = tableFp(dir, "documents")
    val fpVecs = tableFp(dir, "embeddings")
    row("minhash_lsh",
      probeTouching(memoApprox(s, s"mh-t03-$fpDocs")(
        Dedup.minhashLshPairs(docs, threshold = 0.3)), dDocs),
      cachedGroundTruth(s, s"jacc-t03-d$dDocs-$fpDocs")(
        Dedup.jaccardProbePairs(docs, threshold = 0.3, probeDenom = dDocs)),
      Seq("id_a", "id_b"), floor = 0.7)
      .unionByName(row("embed_lsh",
        // thinnest margin of the four (measured ~0.76, and the exact
        // pair set is the smallest → most sampling noise across
        // testdata regeneration) — floored a notch lower
        probeTouching(memoApprox(s, s"clsh-t04-b4-$fpVecs")(
          Similarity.cosineDupPairsLsh(e, threshold = 0.4, bits = 4)), dVecs),
        cachedGroundTruth(s, s"cosp-t04-d$dVecs-$fpVecs")(
          Similarity.cosineProbePairs(e, threshold = 0.4, probeDenom = dVecs)),
        Seq("id_a", "id_b"), floor = 0.55))
      .unionByName {
        // the ann_lsh and ann_ivf rows share the SAME exact sibling;
        // Catalyst does not CSE across union branches, so the (cached or
        // computed) frame is still localCheckpointed — k×|queries| rows —
        // so neither a cache-miss recompute nor a double parquet scan
        // runs per branch
        val brute = cachedGroundTruth(s, s"brute-k5-q50-$fpVecs")(
          Similarity.bruteForceTopK(q, e, k = 5)).localCheckpoint(true)
        row("ann_lsh",
          // floor 0.55 under the 50-query set (r10): with 10 queries the
          // measured value swung 0.64-0.80 across testdata regenerations
          // (50-pair denominator), forcing the floor down to 0.5; at 250
          // pairs the draw moves ~±0.09 (3σ) and the r10 measurements sit
          // at 0.664 (sf0.01) / 0.720 (sf0.1), so 0.55 is ≥4σ below the
          // observed minimum while the failure mode the floor exists to
          // catch (near-dup-width signatures at mid cosine) measured 0.06
          memoApprox(s, s"annlsh-k5-q50-$fpVecs")(
            Similarity.lshTopK(q, e, k = 5)), brute,
          Seq("query_id", "cand_id"), floor = 0.55)
          .unionByName(row("ann_ivf",
            memoApprox(s, s"annivf-k5-q50-$fpVecs")(
              Similarity.ivfTopK(q, e, k = 5)), brute,
            Seq("query_id", "cand_id"), floor = 0.6))
          .unionByName(row("ann_ivfpq",
            // rerank=64 ≫ k recovers most in-cell ADC misses (rerank=32
            // measured 0.608 — too close to any useful floor), so the
            // binding constraint approaches ann_ivf's nprobe cell
            // coverage; measured 0.700 (sf0.01) / 0.760 (sf0.1) on the
            // 50-query gate set — floored with ann_ivf's margin
            memoApprox(s, s"annivfpq-k5-q50-$fpVecs")(
              Similarity.ivfPqTopK(q, e, k = 5)), brute,
            Seq("query_id", "cand_id"), floor = 0.6))
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- exact dedup: hash-groupBy on normalized text (one shuffle)
    "q40_exact_dedup" -> ((s, dir) => {
      Dedup.exact(Tables.load(s, dir, "documents")).orderBy("doc_id")
    }),

    // -- exact n-gram Jaccard pairs via shingle posting lists
    "q41_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(Tables.load(s, dir, "documents"), threshold = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // -- exact CHARACTER-n-gram Jaccard pairs (the boundary-less-script /
    //    short-text variant of q41; same grouped-explode machinery).
    //    Runs on the SHORT-document slice — char grams' actual use case
    //    (word shingles are too sparse there): exact char-gram Jaccard is
    //    O(Σ df²) and natural language shares so many char grams that
    //    nearly every doc pair co-occurs — at corpus scale use q56's
    //    banded form.
    "q55_jaccard_char" -> ((s, dir) => {
      Dedup.jaccardPairsChar(
        Tables.load(s, dir, "documents").filter(length(col("text")) < 200),
        threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // -- char-gram near-dup at scale: MinHash-LSH over charShingles
    //    (no oracle: banded approximation by design, deterministic)
    "q56_minhash_char" -> ((s, dir) => {
      Dedup.minhashLshPairsChar(Tables.load(s, dir, "documents"), threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // -- near-dup clustering: connected components over the Jaccard pair
    //    graph → doc_id → cluster-representative (what a dedup pipeline
    //    actually consumes; pairs alone don't pick survivors)
    "q50_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, threshold = 0.3)
      Dedup.dedupClusters(docs, pairs).orderBy("doc_id")
    }),

    // -- MinHash-LSH near-dup candidates, exact-verified (no SQL oracle:
    //    xxhash64 signatures are engine-specific; deterministic across runs)
    "q42_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(Tables.load(s, dir, "documents"), threshold = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // -- SimHash near-dup pairs (no SQL oracle, same reason)
    "q43_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(Tables.load(s, dir, "documents"), maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // -- text quality/token statistics (pure column fns over one scan)
    "q44_text_stats" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // -- n-gram-marker language ID
    "q45_lang_id" -> ((s, dir) => {
      TextAnalysis.withLangId(Tables.load(s, dir, "documents"))
        .drop("text")
        .orderBy("doc_id")
    }),

    // -- rolling-hash document fingerprint
    "q46_fingerprint" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // -- multimodal: REAL image bytes end to end. One synthetic PNG per
    //    document (real deflate/CRC encode on executors), decoded back
    //    with javax.imageio and reduced to pixel statistics; the oracle
    //    computes the same stats ANALYTICALLY from doc_id (the test
    //    pattern's channels are closed-form in (id, x, y) — see
    //    Multimodal.syntheticPng), so a decoder that read any pixel
    //    wrong, swapped channels, or mis-sized the raster hash-fails
    "q47_multimodal_features" -> ((s, dir) => {
      val assets = Multimodal.imageAssets(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.featurize(assets)
        .select(col("asset_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("asset_id")
    }),

    // -- RAW-FILE multimodal ingest: the `binary` source (Spark's
    //    binaryFile — one row per asset file, bytes in `content`) feeding
    //    the same real-codec featurize as q47. Setup writes one REAL
    //    .png file per sampled doc (executor-side foreachPartition, no
    //    driver loop) plus a decoy .txt that `pathGlobFilter` must skip
    //    server-side; asset ids travel in the FILENAME, recovered
    //    relationally with regexp_extract — the production shape for an
    //    object-store image corpus, where there is no id column until
    //    you derive one. Oracle = q47's closed-form pixel statistics
    //    over the sampled ids.
    "q127_binary_source" -> ((s, dir) => {
      val tmp = Tables.scratchPath("graft-binsrc", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val assetDir = new java.io.File(tmp, "assets")
      assetDir.mkdirs()
      Tables.load(s, dir, "documents")
        .select(col("doc_id").cast("long").as("id"))
        .filter(col("id") % 37 === 0)
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.foreach { r =>
            val id = r.getLong(0)
            java.nio.file.Files.write(
              new java.io.File(assetDir, f"img_$id%08d.png").toPath,
              Multimodal.syntheticPng(id)): Unit
          }
        }
      java.nio.file.Files.write(
        new java.io.File(assetDir, "README.txt").toPath,
        "not an image".getBytes("UTF-8")): Unit
      val bin = graft.sources.Sources.read(s, graft.sources.SourceSpec(
        "binary", assetDir.toString,
        options = Map("pathGlobFilter" -> "*.png")))
      val assets = bin.select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("asset_id"),
        lit("image").as("modality"),
        col("content").as("bytes"),
        struct(col("length").as("n_bytes"), lit("png").as("tag")).as("meta"))
      Multimodal.featurize(assets)
        .select(col("asset_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("asset_id")
    }),

    // -- multimodal audio: REAL RIFF/WAVE bytes end to end — one
    //    synthetic 16-bit PCM clip per document (AudioSystem encode on
    //    executors), decoded back with javax.sound.sampled and reduced
    //    to amplitude stats the oracle derives analytically from doc_id
    //    (closed-form ramp — see Multimodal.syntheticWav)
    "q100_audio_features" -> ((s, dir) => {
      val assets = Multimodal.audioAssets(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.audioFeatures(assets)
        .select(col("asset_id"), col("sample_rate"), col("channels"),
          col("n_samples"), round(col("mean_amp"), 4).as("mean_amp"),
          col("peak_amp"))
        .orderBy("asset_id")
    }),

    // -- multimodal resize: REAL decode → nearest-neighbor raster scale
    //    → PNG re-encode → REAL decode again. The oracle pins the
    //    closed-form output dims and the constant blue channel (invariant
    //    under any subsampling); the full pixel closed-form is pinned in
    //    OpsSpec
    "q101_multimodal_resize" -> ((s, dir) => {
      val assets = Multimodal.imageAssets(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.featurize(Multimodal.resizeImages(assets, maxDim = 3))
        .select(col("asset_id"), col("width"), col("height"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("asset_id")
    }),

    // -- multimodal video: REAL multi-frame container end to end — one
    //    synthetic animated GIF per document (real LZW/palette encode on
    //    executors), frame count read from the stream, every 2nd frame's
    //    raster decoded back with the multi-frame ImageIO reader. The
    //    oracle derives frame count, sampled frame numbers, dims, and
    //    per-frame channel means analytically from doc_id (closed-form
    //    solid frames — see Multimodal.syntheticGif), so a reader that
    //    miscounts frames, samples the wrong ones, or decodes any raster
    //    wrong hash-fails
    "q102_video_frames" -> ((s, dir) => {
      val assets = Multimodal.videoAssets(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.videoFrameFeatures(assets, every = 2)
        .select(col("asset_id"), col("n_frames"), col("frame_no"),
          col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("asset_id", "frame_no")
    }),

    // -- exact cosine top-k via broadcast + partial-agg TopK Aggregator
    "q48_cosine_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    // -- approximate top-k via random-hyperplane LSH buckets (no oracle:
    //    approximate by design; deterministic planes, seed=42)
    "q49_ann_lsh" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.lshTopK(e.filter(col("vec_id") < 10), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    // -- exact embedding-cosine near-dup pairs (broadcast NLJ; the
    //    oracle-checkable form — cosineDupPairsLsh is the 100 TB path)
    "q51_embed_dup_exact" -> ((s, dir) => {
      Similarity.cosineDupPairs(Tables.load(s, dir, "embeddings"), threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // -- embedding near-dup at scale: LSH bucket candidates + exact
    //    verify (no oracle: probabilistic recall by design; 6-bit
    //    signatures keep recall usable at the 0.4 threshold)
    "q52_embed_dup_lsh" -> ((s, dir) => {
      // bits = 4: the 0.4 threshold is a MID-cosine regime — see the
      // lshTopK scaladoc for the collision math; q85 pins the recall
      // floor that a near-dup-tuned signature width would break
      Similarity.cosineDupPairsLsh(
        Tables.load(s, dir, "embeddings"), threshold = 0.4, bits = 4)
        .orderBy("id_a", "id_b")
    }),

    // -- IVF approximate top-k: spherical k-means cells + nprobe probing
    //    (no oracle: approximate by design; deterministic init/iters)
    "q53_ann_ivf" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    // -- IVF-PQ: the coarse index above plus product-quantized codes in
    //    the probe scan + ADC candidate selection + exact re-rank (no
    //    oracle: approximate by design; deterministic training; the
    //    q104 audit pins precision and q85 the recall floor)
    "q103_ann_ivfpq" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.ivfPqTopK(e.filter(col("vec_id") < 10), e, k = 5)
        .orderBy("query_id", "rank")
    }),

    // q103 (IVF-PQ ANN top-k) vs q48: same two invariants as q60/q61 —
    // the exact re-rank stage makes reported scores exactly re-computable
    "q104_ann_ivfpq_audit" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      annAudit(Similarity.ivfPqTopK(q, e, k = 5),
        Similarity.bruteForceTopK(q, e, k = 5), e)
    }),

    // -- SemDeDup (Abbas et al. 2023): k-means the embedding space,
    //    drop an item when a (probe-)cell neighbor above the cosine
    //    threshold precedes it in (centroid_cos, id) order — the
    //    keep-the-diverse-representative rule at a per-cell cost.
    //    (no oracle: k-means training is not SQL-expressible;
    //    deterministic init/iters, and q111 audits pair exactness +
    //    recall against the brute-force ground truth)
    "q110_semantic_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      // the spherical-k-means model is a pure deterministic function of
      // (corpus, nlist, iters, trainPerCell) — cached by corpus
      // fingerprint like q85's ground truth, so passes 2+ skip the
      // training loop; the assignment + drop logic under test still
      // runs fully every pass
      val cents = cachedGroundTruth(s,
        s"cents-nl0-it3-tpc256-${tableFp(dir, "embeddings")}")(
        Similarity.trainedCentroids(e))
      // probeCells rides the AUTO default (resolveProbes: max(4,
      // ceil(log2(nlist)/2)) — resolves to 4 at every current SF, so
      // the cross-round hashes are unchanged; at larger corpora the
      // width grows with the cell count instead of decaying in recall
      Similarity.semanticDedupWith(e, cents, threshold = 0.4)
        .orderBy("vec_id")
    }),

    // -- SemDeDup audit, violations-only: (a) every candidate pair must
    //    exist in the exact pair set with the identical exact cosine
    //    (precision 1.0 by construction — a false positive or score
    //    drift means the probe replication attached a wrong vector);
    //    (b) the measured pair recall vs the brute-force ground truth
    //    must clear 0.70 (observed: 0.94 sf0.001 / 0.93 sf0.01 /
    //    0.81 sf0.1 — all at an effective probe width of 4).
    //    TUNING POLICY, IMPLEMENTED (r13): the recall curve falls with
    //    corpus growth for a structural reason — nlist grows as
    //    ~sqrt(corpus) while a fixed probe count covers a SHRINKING
    //    fraction of cells, so cell-boundary pair losses accumulate
    //    (the r12 curve projected ~0.65-0.70 at the next 10x, i.e. at
    //    the floor). probeCells now defaults to AUTO
    //    (Similarity.resolveProbes: max(4, ceil(log2(nlist)/2)), cost
    //    linear replication of the id-only probe exchange — vectors
    //    never ride it), which this entry rides: at every current SF
    //    AUTO resolves to 4, so the measured number stays directly
    //    comparable with r11/r12; past nlist=256 the width starts
    //    growing instead of the recall decaying. Floor stays 0.70. If
    //    a future corpus still trips it, widen the AUTO formula —
    //    OpsSpec pins the resolver so the change is one visible line.
    "q111_semdedup_audit" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      // same fingerprint-keyed model cache as q110 (the two entries
      // train identically, so one cached artifact serves both)
      val cents = cachedGroundTruth(s,
        s"cents-nl0-it3-tpc256-${tableFp(dir, "embeddings")}")(
        Similarity.trainedCentroids(e))
      val sem = Similarity.semanticDupPairsWith(
        e, cents, threshold = 0.4)
      val exact = Similarity.cosineDupPairs(e, threshold = 0.4)
        .withColumnRenamed("cos", "c_exact")
      val fp = sem.join(exact, Seq("id_a", "id_b"), "left")
        .filter(col("c_exact").isNull || col("cos") =!= col("c_exact"))
        .select(col("id_a"), col("id_b"),
          when(col("c_exact").isNull, lit("false_positive"))
            .otherwise(lit("score_mismatch")).as("violation"))
      val low = exact
        .join(sem.select("id_a", "id_b").withColumn("__hit", lit(1)),
          Seq("id_a", "id_b"), "left")
        .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("recall"))
        .filter(col("recall") < 0.70)
        .select(lit(-1L).as("id_a"),
          round(col("recall") * 10000).cast("long").as("id_b"),
          lit("recall_below_floor").as("violation"))
      fp.unionByName(low).orderBy("id_a", "id_b")
    }),

    // -- semantic decontamination: corpus items embedding-close to any
    //    holdout/benchmark item, with their closest holdout and exact
    //    cosine — catches paraphrased leakage the token-level gates
    //    (q69/q70/q96) structurally miss. Exact (broadcast holdout, one
    //    corpus scan, map-side max), so fully DuckDB-oracled.
    "q113_semantic_decontamination" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      TrainingPrep.semanticContamination(
          corpus = e.filter(col("vec_id") >= 20),
          holdout = e.filter(col("vec_id") < 20),
          threshold = 0.4)
        .orderBy("vec_id")
    }),

    // -- URL decomposition for provenance columns. The corpus carries no
    //    URLs, so a deterministic synthetic URL is derived from doc_id
    //    (the q63 injection pattern) and pushed through Spark's REAL
    //    parse_url; the oracle re-derives every part analytically from
    //    doc_id — a parser that mangled any component hash-fails
    "q107_url_parts" -> ((s, dir) => {
      val url = concat(
        lit("https://sub"), pmod(col("doc_id"), lit(3)).cast("string"),
        lit(".site"), pmod(col("doc_id"), lit(97)).cast("string"), lit("."),
        element_at(
          array(lit("com"), lit("org"), lit("net"), lit("io")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
        lit("/p/"), col("doc_id").cast("string"),
        lit("?ref="), pmod(col("doc_id"), lit(7)).cast("string"))
      TextAnalysis.urlParts(
          Tables.load(s, dir, "documents").withColumn("url", url), "url")
        .select("doc_id", "url", "scheme", "host", "registered_domain",
          "path", "query")
        .orderBy("doc_id")
    }),

    // -- per-domain frequency capping over the synthetic provenance
    //    (C4/RefinedWeb anti-boilerplate): keep the 3 longest docs per
    //    registered domain, window-free (bounded-heap TopKAggregator —
    //    the head domain never becomes one giant sort partition)
    "q108_domain_cap" -> ((s, dir) => {
      val url = concat(
        lit("https://sub"), pmod(col("doc_id"), lit(3)).cast("string"),
        lit(".site"), pmod(col("doc_id"), lit(97)).cast("string"), lit("."),
        element_at(
          array(lit("com"), lit("org"), lit("net"), lit("io")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
        lit("/p/"), col("doc_id").cast("string"))
      val parts = TextAnalysis.urlParts(
        Tables.load(s, dir, "documents").withColumn("url", url), "url")
      TrainingPrep.perDomainCap(parts, cap = 3)
        .select("doc_id", "registered_domain", "n_chars")
        .orderBy("registered_domain", "doc_id")
    }),

    // -- PII redaction (the C4/RefinedWeb-style release scrub). The
    //    corpus contains no PII, so a deterministic synthetic layer is
    //    injected FIRST — identically in the oracle — and the redaction
    //    regexes do real work on every third doc.
    "q63_pii_redact" -> ((s, dir) => {
      val injected = when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" or 192.168."), (col("doc_id") % 256).cast("string"), lit(".1"),
          lit(" or +1 (555) 010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      Tables.load(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.redactPii(injected).as("redacted"),
        regexp_count(injected, lit(TextAnalysis.emailPattern)).as("n_emails"),
        regexp_count(injected, lit(TextAnalysis.ipv4Pattern)).as("n_ips"))
        .orderBy("doc_id")
    }),

    // -- Gopher-style repetition profile: most-frequent-bigram share
    "q64_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // -- concat-and-chunk sequence packing: deterministic sharded layout
    //    of the token stream into fixed 2048-token chunks (how
    //    pretraining batches are formed); each doc's chunk assignment
    //    depends only on ids, never on physical partitioning
    "q68_pack_chunks" -> ((s, dir) => {
      graft.ops.TrainingPrep.packChunks(
        Tables.load(s, dir, "documents"), chunkTokens = 2048, shards = 64)
        .orderBy("doc_id")
    }),

    // -- exact train/holdout contamination over the q66 hash split:
    //    holdout docs whose normalized text also appears in train
    //    (train side collapsed to distinct texts, then joined). The
    //    corpus' organic exact dups rarely straddle the split, so a
    //    deterministic canary text is injected into every 13th doc —
    //    identically in the oracle (the q63 pattern) — guaranteeing the
    //    detector sees real cross-split duplicates.
    "q69_split_contamination" -> ((s, dir) => {
      val injected = Tables.load(s, dir, "documents")
        .withColumn("text", when(col("doc_id") % 13 === 0,
          lit("shared canary document for leakage checks"))
          .otherwise(col("text")))
      graft.ops.TrainingPrep.splitContamination(injected)
        .orderBy("doc_id")
    }),

    // -- n-gram decontamination (GPT-3-style 13-gram rule): holdout docs
    //    sharing any distinct word 13-gram with any train doc; per-gram
    //    seen-in-train boolean via distinct+left-join, so no pair
    //    explosion. k=5 here: the synthetic docs are short enough that
    //    13-grams are near-unique, and the machinery is k-independent.
    "q70_ngram_contamination" -> ((s, dir) => {
      graft.ops.TrainingPrep.ngramContamination(
        Tables.load(s, dir, "documents"), k = 5)
        .orderBy("doc_id")
    }),

    // -- top-3 TF-IDF terms per doc (df as a per-term aggregate joined
    //    back — AQE broadcasts the vocabulary-sized df table; scores
    //    rounded before ranking so ordering is engine-stable)
    "q71_tfidf_top_terms" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      graft.ops.TrainingPrep.tfidfTopTerms(d, corpusN = d.count())
        .orderBy("doc_id", "rank")
    }),

    // -- deterministic stratified sample: 20 docs per language by
    //    id-hash order — reproducible downsampling, unlike sample()
    "q73_stratified_sample" -> ((s, dir) => {
      graft.ops.TrainingPrep.stratifiedSample(
        Tables.load(s, dir, "documents"), n = 20)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // -- mixture rebalancing: downsample languages to a target mixture
    //    without upsampling (the scarcest weighted language keeps 100%);
    //    membership is an id-hash threshold, so the rebalanced corpus is
    //    reproducible and the oracle replays it exactly
    "q74_mixture_rebalance" -> ((s, dir) => {
      graft.ops.TrainingPrep.rebalanceMixture(
        Tables.load(s, dir, "documents"),
        weights = Map("en" -> 0.4, "es" -> 0.2, "de" -> 0.2,
          "fr" -> 0.1, "zh" -> 0.1))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // -- native kernels through the SQL surface: GraftFunctions
    //    registers every custom Catalyst expression as a SQL function
    //    (the SparkSessionExtensions leg of the design); vec_dot is the
    //    oracle-replicable one (DuckDB list_dot_product)
    "q75_sql_kernels" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val v = s"emb_sqlk_${math.abs(dir.hashCode)}"
      Tables.load(s, dir, "embeddings").createOrReplaceTempView(v)
      s.sql(
        s"""SELECT vec_id,
           |  round(vec_dot(embedding, embedding), 4) AS norm2
           |FROM $v ORDER BY vec_id""".stripMargin)
    }),

    // -- kNN label evaluation: majority label among each query vector's
    //    exact top-5 neighbors vs its own label (the embedding-quality /
    //    classification-eval shape; deterministic majority tie-break:
    //    highest vote count, then smallest label)
    "q78_knn_label" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val labels = e.select(col("vec_id"), col("label"))
      val topk = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e, k = 5)
      val votes = topk
        .join(labels.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .groupBy("query_id", "label").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("n").desc, col("label").asc)
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("label").as("knn_label"), col("n").as("n_votes"))
        .join(labels.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("label", "own_label"), "query_id")
        .select("query_id", "own_label", "knn_label", "n_votes")
        .orderBy("query_id")
    }),

    // -- the Layer C flagship composition (analogue of q33 for the
    //    engine layer): dedup → quality filter → PII redaction → split
    //    in one call, oracle-verified as a whole
    "q77_corpus_prep" -> ((s, dir) => {
      graft.ops.TrainingPrep.prepareCorpus(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------- audits
    // Self-verifying entries for the sketch operators: each approximate
    // query (no SQL oracle possible — engine-specific hashes) is checked
    // against its exact sibling ON THE SAME INPUT, emitting VIOLATIONS of
    // invariants the implementation guarantees (exact verification ⇒ no
    // false positives; shared scoring ⇒ identical scores). The oracle is
    // `WHERE false`: a non-empty result is a red hash-mismatch in the
    // driver's gate instead of a silent rows-only pass. Recall misses are
    // NOT violations (LSH is allowed to miss near-threshold pairs).

    // q42 (MinHash-LSH word grams) vs q41 (exact Jaccard): every LSH pair
    // must appear in the exact output with the same jaccard. The exact
    // side disables BOTH df caps (relative AND absolute) because LSH
    // verification scores TRUE Jaccard (full-set intersection) — the
    // invariant pinned here is subset-of-truth, and a binding cap on the
    // exact side would turn real near-dups into false "violations".
    "q57_minhash_audit" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val lsh = Dedup.minhashLshPairs(docs, threshold = 0.3)
        .withColumnRenamed("jaccard", "j_lsh")
      val exact = Dedup.jaccardPairs(docs, threshold = 0.3,
        maxDocFreq = Long.MaxValue, relativeCap = false)
        .withColumnRenamed("jaccard", "j_exact")
      lsh.join(exact, Seq("id_a", "id_b"), "left")
        .filter(col("j_exact").isNull || col("j_lsh") =!= col("j_exact"))
        .select(col("id_a"), col("id_b"),
          when(col("j_exact").isNull, lit("false_positive"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // q56's operator (MinHash-LSH char grams) vs q55's (exact char-gram
    // Jaccard), both on the short-doc slice so the subset property is
    // input-for-input exact.
    "q58_minhash_char_audit" -> ((s, dir) => {
      val short = Tables.load(s, dir, "documents")
        .filter(length(col("text")) < 200)
      val lsh = Dedup.minhashLshPairsChar(short, threshold = 0.5)
        .withColumnRenamed("jaccard", "j_lsh")
      val exact = Dedup.jaccardPairsChar(short, threshold = 0.5,
        maxDocFreq = Long.MaxValue) // uncapped: the audit pins TRUE jaccard
        .withColumnRenamed("jaccard", "j_exact")
      lsh.join(exact, Seq("id_a", "id_b"), "left")
        .filter(col("j_exact").isNull || col("j_lsh") =!= col("j_exact"))
        .select(col("id_a"), col("id_b"),
          when(col("j_exact").isNull, lit("false_positive"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // q52 (embedding LSH near-dup) vs q51 (exact broadcast NLJ): LSH
    // output must be a subset with identical rounded cosines.
    "q59_embed_lsh_audit" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val lsh = Similarity.cosineDupPairsLsh(e, threshold = 0.4, bits = 4) // mirrors q52
        .withColumnRenamed("cos", "c_lsh")
      val exact = Similarity.cosineDupPairs(e, threshold = 0.4)
        .withColumnRenamed("cos", "c_exact")
      lsh.join(exact, Seq("id_a", "id_b"), "left")
        .filter(col("c_exact").isNull || col("c_lsh") =!= col("c_exact"))
        .select(col("id_a"), col("id_b"),
          when(col("c_exact").isNull, lit("false_positive"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // q49 (LSH ANN top-k) vs q48 (exact top-k): (a) at every rank the ANN
    // cosine cannot EXCEED the exact one (exact top-k dominates any
    // candidate subset); (b) every reported ANN score must equal the
    // recomputed true cosine (pins the rehydration join — a wrong vector
    // attached to a candidate would surface here).
    "q60_ann_lsh_audit" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      annAudit(Similarity.lshTopK(q, e, k = 5),
        Similarity.bruteForceTopK(q, e, k = 5), e)
    }),

    // q53 (IVF ANN top-k) vs q48: same two invariants.
    "q61_ann_ivf_audit" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      annAudit(Similarity.ivfTopK(q, e, k = 5),
        Similarity.bruteForceTopK(q, e, k = 5), e)
    }),

    // q43 (SimHash banded pairs): recompute each side's simhash FROM THE
    // TEXT and re-derive the hamming distance — pins the
    // hash-rides-in-the-grouped-list optimization (a wrong hash paired
    // with an id inside the bucket lists would surface here).
    "q62_simhash_audit" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      val h = docs.select(col("doc_id"),
        Dedup.simhash(Dedup.normalize(col("text"))).as("h"))
      pairs
        .join(h.select(col("doc_id").as("id_a"), col("h").as("h_a")), "id_a")
        .join(h.select(col("doc_id").as("id_b"), col("h").as("h_b")), "id_b")
        .filter(
          bit_count(col("h_a").bitwiseXOR(col("h_b"))) =!= col("hamming") ||
            col("hamming") > 3)
        .select(col("id_a"), col("id_b"), lit("hamming_mismatch").as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // -- heavy hitters (mergeable Misra-Gries, Agarwal et al. 2012)
    //    audited against exact token counts: (a) every item the sketch
    //    carries must estimate inside the MG band [true - n/(cap+1),
    //    true]; (b) every token with true count > n/(cap+1) must be
    //    PRESENT. Both invariants hold under ANY merge order — the raw
    //    map does not, which is exactly why the battery pins the
    //    invariants, never the tail. Violations = empty relation.
    "q128_heavy_hitters_audit" -> ((s, dir) => {
      val toks = normalizedTokens(s, dir)
      val cap = 64
      mgAudit(toks,
        TextAnalysis.heavyHitters(toks, col("tok"), cap)
          .withColumnRenamed("item", "tok"), cap)
    }),

    // -- q128's MG invariants driven through the SQL SURFACE instead of
    //    the Column API (GraftFunctions "freq_items" — the registry
    //    bridge that plans a typed Aggregator as a SQL-callable
    //    aggregate), at a tighter capacity (32) so the batched trim
    //    fires harder on the same corpus. Pins end-to-end that a
    //    pipeline author can put `freq_items(tok, 32)` in an
    //    extract_query and get the audited sketch — not only a Scala
    //    caller. Same audited band; violations = empty relation.
    "q131_freq_items_sql" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val toks = normalizedTokens(s, dir)
      toks.createOrReplaceTempView("q131_toks")
      val cap = 32
      val sk = s.sql(
        s"""SELECT explode(sk) AS (tok, est)
           |FROM (SELECT freq_items(tok, $cap) AS sk FROM q131_toks)""".stripMargin)
      mgAudit(toks, sk, cap)
    }),

    // -- production-shaped heavy-hitter composition: "which registered
    //    domains dominate the crawl?" — the provenance question every
    //    web-scale pipeline asks before capping or reweighting a
    //    source. urlParts (q107's kernel) extracts registered_domain
    //    from synthetic crawl URLs whose host distribution is
    //    deliberately Zipf-ish (a third of the corpus concentrates on
    //    four sites, so the sketch MUST carry them at this capacity);
    //    freq_items (q131's SQL kernel) sketches domain frequencies in
    //    one aggregation; mgAudit replays the Misra-Gries bands against
    //    exact domain counts. Violations = empty relation.
    "q143_top_domains" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val site = when(pmod(col("doc_id"), lit(3)) === 0,
        pmod(col("doc_id"), lit(4))).otherwise(pmod(col("doc_id"), lit(97)))
      val url = concat(
        lit("https://sub"), pmod(col("doc_id"), lit(3)).cast("string"),
        lit(".site"), site.cast("string"), lit("."),
        element_at(array(lit("com"), lit("org"), lit("net"), lit("io")),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
        lit("/p/"), col("doc_id").cast("string"))
      val doms = TextAnalysis.urlParts(
          Tables.load(s, dir, "documents").withColumn("url", url), "url")
        .select(col("registered_domain").as("tok"))
      doms.createOrReplaceTempView("q143_doms")
      val cap = 16
      val sk = s.sql(
        s"""SELECT explode(sk) AS (tok, est)
           |FROM (SELECT freq_items(tok, $cap) AS sk FROM q143_doms)""".stripMargin)
      mgAudit(doms, sk, cap)
    }),

    // -- persisted-profile ROLLUP for DISTRIBUTIONS (the numeric
    //    sibling of q129/q132): per-(lang, shard) fixed-bin histograms
    //    of n_chars are stored through a real parquet round-trip
    //    (map<int,bigint> column), then per-lang distribution answers
    //    come from histMerge over the stored maps. Fixed bins make the
    //    rollup EXACT — map-for-map equal to the direct one-pass
    //    histogram (violation A; zero drift, unlike the HLL union) —
    //    and any quantile read off the rollup lands within one bin
    //    width of the true rank element (violation B, checked against
    //    the exact median via row_number). Violations = empty relation.
    "q133_hist_rollup" -> ((s, dir) => {
      import graft.ops.Profiling
      val docs = Tables.load(s, dir, "documents")
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
      val (lo, hi, nbins) = (0.0, 20000.0, 256)
      val binw = (hi - lo) / nbins
      val skPath = Tables.scratchPath("graft-histsk", dir)
      Profiling.histSketch(docs, "n_chars", lo, hi, nbins,
        Seq("lang", "shard"))
        .write.mode("overwrite").parquet(skPath) // the stored profile table
      val rolled = Profiling.histMerge(
        s.read.parquet(skPath), "hist", Seq("lang"))
      val direct = Profiling.histSketch(docs, "n_chars", lo, hi, nbins,
        Seq("lang"))
      val histsDiffer = rolled.join(direct.withColumnRenamed("hist", "hist_d"), "lang")
        .filter(sort_array(map_entries(col("hist"))) =!=
          sort_array(map_entries(col("hist_d"))))
        .select(col("lang"), lit("rollup_hist_mismatch").as("violation"))
      // exact median element per lang (rank ceil(n/2) by n_chars)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("n_chars", "doc_id")
      val exact = docs
        .filter(col("n_chars").isNotNull) // sketch counts non-null only
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .filter(col("rn") === ceil(col("n") / 2.0).cast("int"))
        .select(col("lang"), col("n_chars").as("v"))
      val quantOff = rolled
        .select(col("lang"),
          Profiling.histQuantile(col("hist"), lo, hi, nbins, 0.5).as("est"))
        .join(exact, "lang")
        .filter(!(col("v") >= col("est") && col("v") <= col("est") + lit(binw)) &&
          !(col("est") === lit(hi) && col("v") >= lit(hi)))
        .select(col("lang"), lit("quantile_off_band").as("violation"))
      histsDiffer.union(quantOff).orderBy("lang", "violation")
    }),

    // -- q133's profile family driven ENTIRELY through the SQL surface
    //    (GraftFunctions hist_bin/hist_quantile): the sketch build is
    //    plain SQL over hist_bin — GROUP BY bin + map_from_entries IS
    //    histSketch — and the per-lang doc count, median, and p90 are
    //    read from the map alone. Unlike the empty-relation audits this
    //    is a HASH-MATCHED entry: quantile reads are bin LEFT EDGES
    //    (lo + bin·binw, exact IEEE arithmetic on integer bins — binw
    //    78.125 is a dyadic rational), so DuckDB replays them bitwise
    //    with window-function cumulative counts. Pins that a pipeline
    //    author gets the whole persisted-profile pattern from an
    //    extract_query string, no Scala.
    "q135_hist_sql" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.load(s, dir, "documents").createOrReplaceTempView("q135_docs")
      s.sql(
        """WITH b AS (
          |  SELECT lang, hist_bin(n_chars, 0, 20000, 256) AS bin,
          |         count(1) AS cnt
          |  FROM q135_docs WHERE n_chars IS NOT NULL GROUP BY 1, 2),
          |sk AS (
          |  SELECT lang, map_from_entries(sort_array(
          |           collect_list(struct(bin, cnt)))) AS hist
          |  FROM b GROUP BY lang)
          |SELECT lang,
          |  aggregate(map_values(hist), 0L, (a, c) -> a + c) AS n,
          |  hist_quantile(hist, 0, 20000, 256, 0.5) AS med,
          |  hist_quantile(hist, 0, 20000, 256, 0.9) AS p90
          |FROM sk ORDER BY lang""".stripMargin)
    }),

    // -- C4-style line-level cleaning (Raffel et al. 2020 §2.2) over a
    //    deterministically LINED corpus: the synthetic docs carry no
    //    newlines or punctuation, so a regex first breaks each doc into
    //    6-word '.'-terminated lines with the (< 6-word) remainder left
    //    unterminated — content-driven structure both engines replay
    //    bitwise, no injection table. The filter then exercises every
    //    rule on real variation: unterminated tails always drop, the
    //    bad-substring rule uses a live corpus token ("spark"), short
    //    docs fail the min-lines gate, and the doc text is REWRITTEN to
    //    the kept lines. Hash-matched against the DuckDB replay.
    "q136_c4_line_filter" -> ((s, dir) => {
      val lined = Tables.load(s, dir, "documents")
        .withColumn("text",
          regexp_replace(col("text"), "((\\S+ ){5}\\S+) ?", "$1.\n"))
      TextAnalysis.c4LineFilter(lined, badSubstrings = Seq("spark"))
        .select(col("doc_id"), col("text").as("text_clean"),
          col("n_lines").cast("long").as("n_lines"))
        .orderBy("doc_id")
    }),

    // -- compression-ratio quality signal (CCNet / RedPajama-V2
    //    `compression_ratio`): zlib has no cross-engine oracle, so this
    //    is an AUDIT over invariants that must hold for a correct
    //    deflate at a fixed level — (a) ratios on >= 64-byte docs land
    //    in (0, 1.1] (the corpus's 40-word vocab compresses well under
    //    1; even incompressible text only pays the zlib framing),
    //    (b) DUPLICATION COMPRESSES: deflate's 32 KB window turns the
    //    second copy of a doc into one back-reference, so
    //    ratio(text ⧺ text) < ratio(text) for every doc, and (c) the
    //    SQL-registered kernel is bitwise the Column kernel. Violations
    //    = empty relation.
    "q138_compression_audit" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val scored = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) >= 64)
        .select(col("doc_id"), col("text"),
          TextAnalysis.compressionRatio(col("text")).as("r"),
          TextAnalysis.compressionRatio(
            concat(col("text"), lit(" "), col("text"))).as("r2"))
      scored.createOrReplaceTempView("q138_scored")
      val range = scored.filter(col("r") <= 0.0 || col("r") > 1.1)
        .select(col("doc_id"), lit("ratio_out_of_range").as("violation"))
      val dup = scored.filter(col("r2") >= col("r"))
        .select(col("doc_id"),
          lit("duplication_not_compressive").as("violation"))
      val parity = s.sql(
        "SELECT doc_id, deflate_ratio(text) AS r_sql FROM q138_scored")
        .join(scored, "doc_id")
        .filter(col("r_sql") =!= col("r"))
        .select(col("doc_id"), lit("sql_parity").as("violation"))
      range.union(dup).union(parity).orderBy("doc_id", "violation")
    }),

    // -- persisted-sketch ROLLUP for heavy hitters (q129's warehouse
    //    shape with OUR mergeable sketch): per-shard MG summaries are
    //    stored through a REAL parquet round-trip (map<string,bigint>
    //    column), then corpus-level heavy hitters come from
    //    freq_items_merge over the stored maps — no raw re-scan. The
    //    mergeable-summaries theorem says the rollup carries the SAME
    //    [t - n/(cap+1), t] band over the whole corpus as a direct
    //    one-pass sketch (unlike HLL's ~1% union re-estimation drift),
    //    so the audit replays mgAudit unchanged against exact corpus
    //    counts. Violations = empty relation.
    "q132_mg_rollup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(pmod(col("doc_id"), lit(8)).as("shard"),
        explode(split(Dedup.normalize(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val cap = 32
      val skPath = Tables.scratchPath("graft-mgsk", dir)
      toks.groupBy("shard")
        .agg(graft.functions.FrequentItems.freqItems(col("tok"), cap).as("sk"))
        .write.mode("overwrite").parquet(skPath) // the stored sketch table
      val rolled = s.read.parquet(skPath)
        .agg(graft.functions.FrequentItems
          .freqItemsMerge(col("sk"), cap).as("sk"))
        .select(explode(col("sk")).as(Seq("tok", "est")))
      mgAudit(toks.select("tok"), rolled, cap)
    }),

    // q42/q52/q49/q53 recall vs their exact siblings: the audits above
    // pin precision; this one pins RECALL floors (violation rows only,
    // empty oracle — a band/bit/probe mis-tune that silently loses
    // near-dups becomes a hard hash failure). Floors documented at
    // [[sketchRecall]].
    "q85_sketch_recall" -> ((s, dir) => {
      sketchRecall(s, dir)
        .filter(col("recall") < col("floor"))
        .orderBy("op")
    }),

    // -- multimodal frame sampling: binary assets → (asset, frame_no,
    //    frame) child rows via partition-local mapPartitions (the video
    //    frame-extraction shape). Frames emitted as strings — the
    //    payloads here are text bytes — so the comparator can hash them.
    "q54_multimodal_frames" -> ((s, dir) => {
      val assets = Multimodal.toAssets(
        Tables.load(s, dir, "documents"), "doc_id", "text", "lang")
      Multimodal.explodeFrames(assets, n = 4, width = 32)
        .select(col("asset_id"), col("frame_no"),
          col("frame").cast("string").as("frame_str"))
        .orderBy("asset_id", "frame_no")
    }),

    // -- Gopher-style quality ruleset: per-doc signals + pass flag, one
    //    narrow codegen'd pass (no shuffle at any scale)
    "q87_gopher_quality" -> ((s, dir) => {
      TextAnalysis.gopherQuality(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // -- cross-doc duplicate-span removal (sub-document dedup): delete
    //    tokens covered by a word 8-gram that occurred earlier in the
    //    corpus, keep the first occurrence
    "q88_dup_span_removal" -> ((s, dir) => {
      Dedup.removeDuplicateSpans(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // -- source-priority survivor selection over q50's near-dup clusters
    //    (keep the most-trusted copy, not an arbitrary member)
    "q90_cluster_survivors" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, threshold = 0.3)
      val clusters = Dedup.dedupClusters(docs, pairs)
      Dedup.keepBestPerCluster(docs, clusters, Seq("src5", "src7"))
        .orderBy("doc_id")
    }),

    // -- deterministic per-source token-budget sampling (mixture by
    //    token counts, not doc counts)
    "q91_token_budget" -> ((s, dir) => {
      graft.ops.TrainingPrep.tokenBudgetSample(
        Tables.load(s, dir, "documents"),
        budgets = Map("src3" -> 800L, "src8" -> 500L),
        shards = 8)
        .orderBy("doc_id")
    }),

    // -- corpus-trained unigram LM scoring (CCNet-style perplexity
    //    filtering, self-contained: the corpus is its own LM)
    "q92_lm_quality" -> ((s, dir) => {
      TextAnalysis.lmQuality(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // -- RAG-style overlapping chunking (32-token chunks, 8 overlap):
    //    narrow transform + generator, zero shuffles at any corpus size
    "q93_chunk_overlap" -> ((s, dir) => {
      graft.ops.TrainingPrep.chunkDocuments(
        Tables.load(s, dir, "documents"), chunkTokens = 32, overlapTokens = 8)
        .orderBy("doc_id", "chunk_no")
    }),

    // -- near-SUPERSET dedup: containment = |A∩B|/min(|A|,|B|) catches a
    //    snippet embedded in a longer doc, which Jaccard structurally
    //    misses (score ~|A|/|B|). The corpus is documents plus derived
    //    prefix-snippet docs (every 7th doc's first third, id+1e6 —
    //    mirrored in the oracle) so the containment-only pairs exist to
    //    be caught: ~30 of the pairs here are invisible to q41's 0.3
    //    Jaccard gate.
    "q95_containment_pairs" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = split(Dedup.normalize(col("text")), " ")
      val snippets = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1),
            greatest(lit(3), (size(toks) / lit(3)).cast("int")))).as("text"))
      Dedup.containmentPairs(
        docs.select("doc_id", "text").unionByName(snippets), threshold = 0.9)
        .orderBy("id_a", "id_b")
    }),

    // -- fastText-style hashed linear classifier scoring: per-token
    //    feature-hash slot -> weight, integer-exact per-doc sum, one
    //    explode + one agg shuffle; the synthetic weight artifact makes
    //    the full scoring path hash-verifiable in plain SQL
    "q98_hashed_classifier" -> ((s, dir) => {
      TextAnalysis.hashedLinearScore(Tables.load(s, dir, "documents"))
        .orderBy("doc_id")
    }),

    // -- leakage-safe split: a doc's split comes from its near-dup
    //    CLUSTER label, so a holdout doc's 0.9-Jaccard twin can never
    //    land in train (the id-hash split leaks it ~90% of the time;
    //    q70 then has to find it after the fact)
    "q97_cluster_safe_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.ops.TrainingPrep.clusterSafeSplit(
        docs, Dedup.jaccardPairs(docs, threshold = 0.3))
        .orderBy("doc_id")
    }),

    // -- Bloom-prefiltered exact decontamination: which TRAIN docs
    //    duplicate a holdout doc (the drop-before-training direction).
    //    The holdout norms build a broadcast Bloom filter; the corpus
    //    scan drops non-members before any shuffle and the exact join
    //    runs on the surviving sliver — same plain-SQL-checkable result
    //    as q69, different (100 TB) mechanism. Canary injection as q69.
    "q96_bloom_decontamination" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            lit("shared canary document for leakage checks"))
            .otherwise(col("text")))
      graft.ops.TrainingPrep.bloomDecontaminate(docs).orderBy("doc_id")
    }),

    // -- Incremental ingest dedup vs the full re-run it replaces: an
    //    idHash slice (~5%) plays the newly-ingested batch, the rest is
    //    the already-loaded corpus whose persisted band index
    //    (minhashBandIndex) gets probed. The incremental result must
    //    EQUAL the full-corpus LSH run restricted to pairs touching the
    //    batch — same pairs, same exact-Jaccard scores — so both
    //    directions of the symmetric difference are violations, not just
    //    false positives (the incremental path promises no recall loss
    //    relative to the full run, unlike the LSH-vs-exact audits).
    "q114_incremental_minhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val isBatch = graft.ops.TrainingPrep.idHash(col("doc_id")) % 20 === 0
      val batch = docs.filter(isBatch)
      val corpus = docs.filter(!isBatch)
      // the "persisted" index: materialized once (localCheckpoint), so
      // the candidate subtree's plan-level duplication re-reads postings
      // instead of re-signing the corpus — the same cost profile as the
      // parquet-backed index a deployment reads
      val index = Dedup.minhashBandIndex(corpus).localCheckpoint()
      val inc = Dedup.incrementalMinhashPairs(batch, corpus, index, threshold = 0.3)
        .withColumnRenamed("jaccard", "j_inc")
      val full = Dedup.minhashLshPairs(docs, threshold = 0.3)
        .withColumnRenamed("jaccard", "j_full")
      // batch membership is deterministic (idHash slice), so the
      // restriction is a filter, never a join
      val fullTouch = full.filter(
        graft.ops.TrainingPrep.idHash(col("id_a")) % 20 === 0 ||
          graft.ops.TrainingPrep.idHash(col("id_b")) % 20 === 0)
      inc.join(fullTouch, Seq("id_a", "id_b"), "full")
        .filter(col("j_inc").isNull || col("j_full").isNull ||
          col("j_inc") =!= col("j_full"))
        .select(col("id_a"), col("id_b"),
          when(col("j_full").isNull, lit("not_in_full"))
            .when(col("j_inc").isNull, lit("missed_by_incremental"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // -- the semantic member of the incremental-dedup family: SemDeDup
    //    pair generation against a persisted cell index (frozen
    //    centroids + cell postings) must equal the SAME-CENTROID full
    //    run restricted to pairs touching the batch. The reference side
    //    is built through the same API with an empty corpus and empty
    //    index, which degenerates to plain all-pairs generation under
    //    the frozen model — so the audit isolates the incremental SLICE
    //    construction, the part that can silently lose pairs. Cosines
    //    AND both centroid cosines must match; both directions of the
    //    symmetric difference are violations.
    "q118_incremental_semantic" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val isBatch = graft.ops.TrainingPrep.idHash(col("vec_id")) % 20 === 0
      val batch = e.filter(isBatch)
      val corpus = e.filter(!isBatch)
      // centroids train on the 95% corpus slice — deterministic in
      // (slice, params), so fingerprint-cached like q110/q111's model
      // (the slice is a pure function of the fingerprinted table)
      val cents = cachedGroundTruth(s,
        s"cents-c95-nl0-it3-tpc256-${tableFp(dir, "embeddings")}")(
        Similarity.trainedCentroids(corpus))
      // probeCells = 0 (AUTO) on BOTH the index postings and the pair
      // calls below: the width must match across the index join, and
      // under AUTO the three sites co-vary with the cell count
      val postings = Similarity.assignBatchCells(corpus, cents, probeCells = 0)
      // persisted-index shape: postings materialized once, so the
      // candidate subtree's plan duplication re-reads them instead of
      // re-running assignment (same rationale as q114's index)
      val idx = postings.localCheckpoint()
      val inc = Similarity.incrementalSemanticDupPairs(
        batch, corpus, idx, cents, threshold = 0.4)
      val full = Similarity.incrementalSemanticDupPairs(
        e, e.filter(lit(false)), idx.filter(lit(false)), cents,
        threshold = 0.4)
        .filter(graft.ops.TrainingPrep.idHash(col("id_a")) % 20 === 0 ||
          graft.ops.TrainingPrep.idHash(col("id_b")) % 20 === 0)
      val i = inc.select(col("id_a"), col("id_b"),
        struct(col("cos"), col("cc_a"), col("cc_b")).as("s_inc"))
      val f = full.select(col("id_a"), col("id_b"),
        struct(col("cos"), col("cc_a"), col("cc_b")).as("s_full"))
      i.join(f, Seq("id_a", "id_b"), "full")
        .filter(col("s_inc").isNull || col("s_full").isNull ||
          col("s_inc") =!= col("s_full"))
        .select(col("id_a"), col("id_b"),
          when(col("s_full").isNull, lit("not_in_full"))
            .when(col("s_inc").isNull, lit("missed_by_incremental"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }),

    // -- per-source quality-quantile gate (DCLM/FineWeb "keep the best
    //    40% of every source" policy): cutoff = each lang's 0.6-quantile
    //    of n_chars, computed as ONE aggregation joined back (never a
    //    percent_rank window over the source partition), gate = a plain
    //    filter. exact mode so the cutoffs — and therefore the surviving
    //    row set — hash-match DuckDB's quantile_cont (q26's epsilon
    //    trick); the approx_percentile default is the 100 TB path, whose
    //    drift q65's audit already measures.
    "q117_quantile_gate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "n_chars")
      graft.ops.TrainingPrep.qualityQuantileGate(
        docs, "n_chars", 0.6, Seq("lang"), exact = true)
        .select("doc_id", "lang", "n_chars", "q_cutoff")
        .orderBy("doc_id")
    }),

    // -- q114's embedding twin: incremental cosine near-dup detection
    //    against a persisted LSH bucket index must equal the full-corpus
    //    run (q52's operator) restricted to pairs touching the batch —
    //    both directions of the symmetric difference are violations.
    "q115_incremental_embed" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val isBatch = graft.ops.TrainingPrep.idHash(col("vec_id")) % 20 === 0
      val batch = e.filter(isBatch)
      val corpus = e.filter(!isBatch)
      val index = Similarity.lshBucketIndex(corpus, bits = 4).localCheckpoint()
      val inc = Similarity.incrementalCosineDupPairs(
        batch, corpus, index, threshold = 0.4, bits = 4)
        .withColumnRenamed("cos", "c_inc")
      val full = Similarity.cosineDupPairsLsh(e, threshold = 0.4, bits = 4)
        .withColumnRenamed("cos", "c_full")
      val fullTouch = full.filter(
        graft.ops.TrainingPrep.idHash(col("id_a")) % 20 === 0 ||
          graft.ops.TrainingPrep.idHash(col("id_b")) % 20 === 0)
      inc.join(fullTouch, Seq("id_a", "id_b"), "full")
        .filter(col("c_inc").isNull || col("c_full").isNull ||
          col("c_inc") =!= col("c_full"))
        .select(col("id_a"), col("id_b"),
          when(col("c_full").isNull, lit("not_in_full"))
            .when(col("c_inc").isNull, lit("missed_by_incremental"))
            .otherwise(lit("score_mismatch")).as("violation"))
        .orderBy("id_a", "id_b")
    }))

  /** Empty-result oracle for the audit entries: the invariant is "no
    * violations", so the oracle is the empty relation with the audit's
    * schema — any violation row becomes a hard hash/row mismatch in the
    * driver's gate. */
  private def noViolations(idA: String, idB: String): String =
    s"""SELECT CAST(NULL AS BIGINT) AS $idA, CAST(NULL AS BIGINT) AS $idB,
       |  CAST(NULL AS VARCHAR) AS violation
       |WHERE false""".stripMargin

  /** q85's oracle: like the audits, the invariant is "no recall floor
    * violations" — the expected relation is empty. */
  private val noRecallViolations: String =
    """SELECT CAST(NULL AS VARCHAR) AS op, CAST(NULL AS DOUBLE) AS recall,
      |  CAST(NULL AS DOUBLE) AS "floor"
      |WHERE false""".stripMargin

  val oracles: Map[String, String] = Map(
    "q68_pack_chunks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000003) * 2654435761) % 1000003 % 64 AS shard,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d)
        |SELECT doc_id, shard, n_tok, start_tok, start_tok // 2048 AS chunk
        |FROM c ORDER BY doc_id""".stripMargin,
    "q69_split_contamination" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN 'shared canary document for leakage checks'
        |      ELSE text END AS text
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
        |      THEN 'train' ELSE 'holdout' END AS split,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM inj),
        |t AS (SELECT norm, count(*) AS n_train_dups, min(doc_id) AS first_train_dup
        |      FROM d WHERE split = 'train' GROUP BY norm)
        |SELECT d.doc_id, CAST(t.n_train_dups AS BIGINT) AS n_train_dups,
        |  t.first_train_dup
        |FROM d JOIN t USING (norm) WHERE d.split = 'holdout'
        |ORDER BY doc_id""".stripMargin,
    "q70_ngram_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
        |      THEN 'train' ELSE 'holdout' END AS split,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, split,
        |    list_distinct(CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
        |      ELSE [array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT doc_id, split, unnest(sh) AS shingle FROM sh),
        |tr AS (SELECT DISTINCT shingle FROM posts WHERE split = 'train'),
        |h AS (
        |  SELECT p.doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |  FROM posts p LEFT JOIN tr ON p.shingle = tr.shingle
        |  WHERE p.split = 'holdout' GROUP BY 1)
        |SELECT doc_id, n_grams, n_contaminated FROM h
        |WHERE n_contaminated > 0 ORDER BY doc_id""".stripMargin,
    "q71_tfidf_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
        |    FROM documents)
        |  WHERE term <> '' GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, term,
        |    round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY term)), 4) AS score
        |  FROM tf),
        |r AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM sc)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, score FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // every URL part re-derived analytically from doc_id — the Spark
    // side must round-trip its synthetic URL through a real parser to
    // reproduce these
    "q107_url_parts" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'sub' || CAST(doc_id % 3 AS VARCHAR) || '.site' ||
        |      CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |      CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |        WHEN 2 THEN 'net' ELSE 'io' END AS host,
        |    'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |      CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |        WHEN 2 THEN 'net' ELSE 'io' END AS registered_domain,
        |    '/p/' || CAST(doc_id AS VARCHAR) AS path,
        |    'ref=' || CAST(doc_id % 7 AS VARCHAR) AS query
        |  FROM documents)
        |SELECT doc_id,
        |  'https://' || host || path || '?' || query AS url,
        |  'https' AS scheme, host, registered_domain, path, query
        |FROM u ORDER BY doc_id""".stripMargin,
    // the oracle states the policy as the window the operator refuses
    // to plan: row_number over the domain partition, capped at 3
    "q108_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    'site' || CAST(doc_id % 97 AS VARCHAR) || '.' ||
        |      CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
        |        WHEN 2 THEN 'net' ELSE 'io' END AS registered_domain
        |  FROM documents)
        |SELECT doc_id, registered_domain, n_chars
        |FROM d
        |QUALIFY row_number() OVER (
        |  PARTITION BY registered_domain
        |  ORDER BY n_chars DESC, doc_id) <= 3
        |ORDER BY registered_domain, doc_id""".stripMargin,
    "q63_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |        || ' or 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
        |        || ' or +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d ().-]{7,}\d', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips
        |FROM inj ORDER BY doc_id""".stripMargin,
    "q64_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(n) AS nb, max(n) AS tb FROM c GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.nb, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(a.tb, 0) AS BIGINT) AS top_bigram_n,
        |  round(CASE WHEN a.nb IS NULL THEN 0.0
        |    ELSE CAST(a.tb AS DOUBLE) / CAST(a.nb AS DOUBLE) END, 6) AS top_frac
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q75_sql_kernels" ->
      """SELECT vec_id,
        |  round(list_dot_product(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS norm2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // q48's top-k SQL extended with labels + deterministic majority
    "q78_knn_label" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS cand_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings),
        |s AS (SELECT query_id, cand_id, label,
        |    round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS cos
        |  FROM q, c WHERE query_id <> cand_id),
        |r AS (SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM s),
        |v AS (SELECT query_id, label, count(*) AS n FROM r WHERE rank <= 5 GROUP BY 1, 2),
        |p AS (SELECT query_id, label AS knn_label, n AS n_votes,
        |    row_number() OVER (PARTITION BY query_id ORDER BY n DESC, label) AS rn
        |  FROM v)
        |SELECT p.query_id, e.label AS own_label, p.knn_label,
        |  CAST(p.n_votes AS BIGINT) AS n_votes
        |FROM p JOIN embeddings e ON e.vec_id = p.query_id
        |WHERE p.rn = 1 ORDER BY query_id""".stripMargin,
    // composition of the q40 dedup, q44 quality, q63 redaction and q66
    // split oracles over the normalized survivor text
    "q77_corpus_prep" ->
      """WITH dd AS (
        |  SELECT min(doc_id) AS doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text,
        |    count(*) AS n_copies
        |  FROM documents GROUP BY 2),
        |q AS (
        |  SELECT doc_id, norm_text, n_copies,
        |    string_split(norm_text, ' ') AS toks
        |  FROM dd),
        |sc AS (
        |  SELECT doc_id, norm_text, n_copies,
        |    round(
        |      least(len(toks) / 100.0, 1.0) * 0.3
        |      + (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
        |      + (1.0 - CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.2
        |      + least(((length(norm_text) - (CAST(len(toks) AS DOUBLE) - 1.0)) / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0) * 0.2
        |      + 0.000000001,
        |      4) AS quality
        |  FROM q)
        |SELECT doc_id,
        |  CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
        |    THEN 'train' ELSE 'holdout' END AS split,
        |  quality,
        |  regexp_replace(regexp_replace(regexp_replace(norm_text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d ().-]{7,}\d', '<PHONE>', 'g') AS text,
        |  CAST(n_copies AS BIGINT) AS n_copies
        |FROM sc WHERE quality >= 0.6 ORDER BY doc_id""".stripMargin,
    "q73_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,
    "q74_mixture_rebalance" ->
      """WITH w(lang, wt) AS (VALUES
        |    ('en', CAST(0.4 AS DOUBLE)), ('es', CAST(0.2 AS DOUBLE)),
        |    ('de', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
        |    ('zh', CAST(0.1 AS DOUBLE))),
        |c AS (SELECT lang, wt, count(*) AS n
        |      FROM documents JOIN w USING (lang) GROUP BY 1, 2),
        |f AS (SELECT lang,
        |        least(CAST(1.0 AS DOUBLE), wt * (SELECT min(n / wt) FROM c) / n) AS keep
        |      FROM c)
        |SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
        |-- floor, NOT a bare CAST: DuckDB's double->BIGINT cast rounds to
        |-- nearest while Spark's .cast("long") truncates; they differ by 1
        |-- whenever frac(keep * 1000003) >= 0.5
        |WHERE ((d.doc_id % 1000003) * 2654435761) % 1000003 < CAST(floor(keep * 1000003) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "q57_minhash_audit" -> noViolations("id_a", "id_b"),
    "q58_minhash_char_audit" -> noViolations("id_a", "id_b"),
    "q59_embed_lsh_audit" -> noViolations("id_a", "id_b"),
    "q60_ann_lsh_audit" -> noViolations("query_id", "cand_id"),
    "q61_ann_ivf_audit" -> noViolations("query_id", "cand_id"),
    "q104_ann_ivfpq_audit" -> noViolations("query_id", "cand_id"),
    "q62_simhash_audit" -> noViolations("id_a", "id_b"),
    "q111_semdedup_audit" -> noViolations("id_a", "id_b"),
    "q114_incremental_minhash" -> noViolations("id_a", "id_b"),
    "q115_incremental_embed" -> noViolations("id_a", "id_b"),
    "q128_heavy_hitters_audit" ->
      """SELECT CAST(NULL AS VARCHAR) AS tok,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q131_freq_items_sql" ->
      """SELECT CAST(NULL AS VARCHAR) AS tok,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q143_top_domains" ->
      """SELECT CAST(NULL AS VARCHAR) AS tok,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q132_mg_rollup" ->
      """SELECT CAST(NULL AS VARCHAR) AS tok,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q133_hist_rollup" ->
      """SELECT CAST(NULL AS VARCHAR) AS lang,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q138_compression_audit" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id,
        |  CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "q136_c4_line_filter" ->
      """WITH l AS (
        |  SELECT doc_id, list_filter(
        |    string_split(regexp_replace(text,
        |      '((\S+ ){5}\S+) ?', '\1.' || chr(10), 'g'), chr(10)),
        |    x -> regexp_matches(trim(x), '[.!?"]$')
        |         AND len(regexp_split_to_array(trim(x), '\s+')) >= 3
        |         AND NOT contains(lower(x), 'spark')) AS kept
        |  FROM documents
        |  WHERE NOT contains(lower(text), '{')
        |    AND NOT contains(lower(text), 'lorem ipsum'))
        |SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
        |  CAST(len(kept) AS BIGINT) AS n_lines
        |FROM l WHERE len(kept) >= 3 ORDER BY doc_id""".stripMargin,
    // binw = 20000/256 = 78.125 (dyadic): bin indices and their left
    // edges are exact in both engines, so this hash-matches
    "q135_hist_sql" ->
      """WITH b AS (
        |  SELECT lang,
        |    CASE WHEN n_chars < 0 THEN -1
        |         WHEN n_chars >= 20000 THEN 256
        |         ELSE CAST(floor(n_chars / 78.125) AS INT) END AS bin,
        |    count(*) AS cnt
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM b),
        |q AS (
        |  SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |    min(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
        |             THEN bin END) AS mbin,
        |    min(CASE WHEN cum >= CAST(ceil(n * 0.9) AS BIGINT)
        |             THEN bin END) AS pbin
        |  FROM c GROUP BY lang)
        |SELECT lang, n,
        |  CASE WHEN mbin < 0 THEN 0.0 WHEN mbin >= 256 THEN 20000.0
        |       ELSE mbin * 78.125 END AS med,
        |  CASE WHEN pbin < 0 THEN 0.0 WHEN pbin >= 256 THEN 20000.0
        |       ELSE pbin * 78.125 END AS p90
        |FROM q ORDER BY lang""".stripMargin,
    "q118_incremental_semantic" -> noViolations("id_a", "id_b"),
    "q117_quantile_gate" ->
      """WITH c AS (
        |  SELECT lang, round(quantile_cont(n_chars, 0.6) + 0.000001, 4) AS q_cutoff
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars, c.q_cutoff
        |FROM documents d JOIN c USING (lang)
        |WHERE d.n_chars >= c.q_cutoff
        |ORDER BY doc_id""".stripMargin,
    "q113_semantic_decontamination" ->
      """WITH c AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id >= 20),
        |h AS (SELECT vec_id AS holdout_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS hv
        |  FROM embeddings WHERE vec_id < 20),
        |s AS (SELECT c.vec_id, h.holdout_id,
        |    round(list_dot_product(v, hv) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(hv, hv))), 4) AS cos
        |  FROM c, h),
        |r AS (SELECT vec_id, holdout_id, cos,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, holdout_id) AS rn
        |  FROM s)
        |SELECT vec_id, holdout_id, cos FROM r WHERE rn = 1 AND cos >= 0.4
        |ORDER BY vec_id""".stripMargin,
    "q85_sketch_recall" -> noRecallViolations,
    "q40_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 2 ORDER BY doc_id""".stripMargin,
    "q41_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |cap AS (SELECT least(10000, greatest(16, (count(*) + 99) // 100)) AS c FROM documents),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= (SELECT c FROM cap)),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) AS jaccard
        |FROM inter
        |WHERE round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "q55_jaccard_char" ->
      """WITH n AS (
        |  SELECT doc_id AS id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents WHERE length(text) < 200),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN length(t) < 5 THEN [t]
        |    ELSE [substr(t, i, 5) for i in range(1, length(t) - 3)] END) AS sh
        |  FROM n),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= 10000),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) AS jaccard
        |FROM inter
        |WHERE round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // connected components re-derived with a recursive CTE over the same
    // pair graph as q41; isolated docs are their own cluster
    "q50_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id AS id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |cap AS (SELECT least(10000, greatest(16, (count(*) + 99) // 100)) AS c FROM documents),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= (SELECT c FROM cap)),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  WHERE round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id)
        |SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        |ORDER BY doc_id""".stripMargin,
    // q90 = q50's cluster derivation + source-priority survivor choice
    // (rank: src5 < src7 < everything, ties on smallest doc_id)
    "q90_cluster_survivors" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id AS id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |cap AS (SELECT least(10000, greatest(16, (count(*) + 99) // 100)) AS c FROM documents),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= (SELECT c FROM cap)),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  WHERE round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
        |clu AS (SELECT d.doc_id, d.source, coalesce(c.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |ranked AS (SELECT *, CASE WHEN source = 'src5' THEN 0
        |  WHEN source = 'src7' THEN 1 ELSE 2 END AS rnk FROM clu),
        |best AS (SELECT cluster, doc_id AS survivor_id FROM ranked
        |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY rnk, doc_id) = 1)
        |SELECT r.doc_id, r.cluster, b.survivor_id,
        |  r.doc_id = b.survivor_id AS keep
        |FROM ranked r JOIN best b ON r.cluster = b.cluster
        |ORDER BY r.doc_id""".stripMargin,
    // mirrors TrainingPrep.tokenBudgetSample: ONE window per source over
    // (shard, hash, id) is arithmetically identical to the engine's
    // shard-offset + within-shard cumsum (same order, same inclusive sum)
    "q91_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    ((doc_id % 1000003) * 2654435761) % 1000003 AS h
        |  FROM documents),
        |b(source, budget) AS (VALUES ('src3', 800), ('src8', 500)),
        |j AS (SELECT d.doc_id, d.source, d.n_tok, d.h, d.h % 8 AS shard, b.budget
        |  FROM d JOIN b USING (source)),
        |c AS (SELECT doc_id, source, n_tok, budget,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY shard, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |  FROM j)
        |SELECT doc_id, source, n_tok, cum_tok FROM c
        |WHERE cum_tok <= budget ORDER BY doc_id""".stripMargin,
    // mirrors TextAnalysis.lmQuality: add-one-smoothed corpus unigram LM,
    // ppl derived from the ROUNDED bits (engine-stable boundary behavior)
    "q92_lm_quality" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |counts AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
        |stats AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
        |probs AS (SELECT term,
        |  (CAST(c AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE)) AS p
        |  FROM counts, stats),
        |d AS (SELECT t.doc_id, count(*) AS n_tokens, sum(log2(p)) AS s
        |  FROM tok t JOIN probs USING (term) GROUP BY t.doc_id),
        |b AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  round(-s / n_tokens + 0.000000001, 4) AS bits_per_token FROM d)
        |SELECT doc_id, n_tokens, bits_per_token,
        |  round(pow(2, bits_per_token), 2) AS ppl
        |FROM b ORDER BY doc_id""".stripMargin,
    // mirrors TrainingPrep.chunkDocuments (chunk=32, overlap=8, stride=24)
    "q93_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |x AS (SELECT doc_id, toks, len(toks) AS n,
        |  CASE WHEN len(toks) <= 32 THEN 1
        |       ELSE 1 + CAST(ceil((len(toks) - 32) / 24.0) AS INT) END AS nc
        |  FROM d),
        |c AS (SELECT x.doc_id, x.toks, x.n, r.i AS chunk_no
        |  FROM x, LATERAL (SELECT unnest(range(0, nc)) AS i) r)
        |SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
        |  CAST(least(32, n - chunk_no * 24) AS INT) AS n_tokens,
        |  array_to_string(toks[CAST(chunk_no * 24 + 1 AS INT):CAST(least(chunk_no * 24 + 32, n) AS INT)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_no""".stripMargin,
    // mirrors q95's snippet injection (every 7th doc's first third,
    // id+1e6) + Dedup.containmentPairs (word 3-grams, q41's df caps,
    // score = i/min(sa,sb))
    "q95_containment_pairs" ->
      """WITH snip AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string(
        |      (string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))[1:greatest(3, len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) // 3)],
        |      ' ') AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM snip),
        |toks AS (
        |  SELECT doc_id AS id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM corpus),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |cap AS (SELECT least(10000, greatest(16, (count(*) + 99) // 100)) AS c FROM corpus),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= (SELECT c FROM cap)),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / least(sa, sb), 6) AS containment
        |FROM inter
        |WHERE round(CAST(i AS DOUBLE) / least(sa, sb), 6) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    // mirrors hashedLinearScore: per-token positional char hash mod
    // 1024 -> centered integer weight, exact long sum, one division
    "q98_hashed_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |fp AS (
        |  SELECT doc_id, tok,
        |    coalesce(list_sum([ascii(tok[i]) * ((i * 2654435761) % 1000003) for i in range(1, len(tok) + 1)]), 0) AS f
        |  FROM tok),
        |w AS (
        |  SELECT doc_id,
        |    ((((f % 1024) + 1024) % 1024) * 2654435761) % 1000003 - 501501 AS wi
        |  FROM fp),
        |agg AS (
        |  SELECT doc_id, count(*) AS n, CAST(sum(wi) AS BIGINT) AS s
        |  FROM w GROUP BY doc_id),
        |m AS (
        |  SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |    round(CAST(s AS DOUBLE) / (n * 501501.0) + 0.000000001, 4) AS margin
        |  FROM agg)
        |SELECT doc_id, n_tokens, margin,
        |  round(1.0 / (1.0 + exp(-margin)) + 0.000000001, 4) AS p_keep
        |FROM m ORDER BY doc_id""".stripMargin,
    // q97 = q50's recursive-CTE cluster derivation + the arithmetic
    // split hash applied to the CLUSTER label instead of the doc id
    "q97_cluster_safe_split" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id AS id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] END) AS sh
        |  FROM toks),
        |posts AS (SELECT id, len(sh) AS setsize, unnest(sh) AS shingle FROM sh),
        |cap AS (SELECT least(10000, greatest(16, (count(*) + 99) // 100)) AS c FROM documents),
        |freq AS (SELECT shingle FROM posts GROUP BY shingle
        |         HAVING count(*) >= 2 AND count(*) <= (SELECT c FROM cap)),
        |f AS (SELECT p.* FROM posts p JOIN freq USING (shingle)),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.setsize AS sa, b.setsize AS sb, count(*) AS i
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  WHERE round(CAST(i AS DOUBLE) / CAST(sa + sb - i AS DOUBLE), 6) >= 0.3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
        |cl AS (
        |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
        |SELECT doc_id, cluster,
        |  CASE WHEN ((cluster % 1000003) * 2654435761) % 1000003 % 100 < 90
        |    THEN 'train' ELSE 'holdout' END AS split
        |FROM cl ORDER BY doc_id""".stripMargin,
    // mirrors q96: canary injection (as q69) + exact train-side matches
    // against holdout norms — the Bloom prefilter is invisible in the
    // result (no false negatives; the join removes false positives)
    "q96_bloom_decontamination" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN 'shared canary document for leakage checks'
        |      ELSE text END AS text
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000003 % 100 < 90
        |      THEN 'train' ELSE 'holdout' END AS split,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM inj),
        |h AS (SELECT norm, count(*) AS n_holdout, min(doc_id) AS first_holdout
        |      FROM d WHERE split = 'holdout' GROUP BY norm)
        |SELECT d.doc_id, CAST(h.n_holdout AS BIGINT) AS n_holdout,
        |  h.first_holdout
        |FROM d JOIN h USING (norm) WHERE d.split = 'train'
        |ORDER BY doc_id""".stripMargin,
    "q44_text_stats" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpeish,
        |  round(
        |    least(len(toks) / 100.0, 1.0) * 0.3
        |    + (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.3
        |    + (1.0 - CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.2
        |    + least(((length(text) - (CAST(len(toks) AS DOUBLE) - 1.0)) / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0) * 0.2
        |    + 0.000000001,
        |    4) AS quality
        |FROM d ORDER BY doc_id""".stripMargin,
    "q45_lang_id" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  lang, source, n_chars FROM documents),
        |s AS (SELECT doc_id, lang, source, n_chars,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS INT) AS score_en,
        |  CAST(len(list_filter(toks, x -> x IN ('el','la','de','y','que','en','un'))) AS INT) AS score_es,
        |  CAST(len(list_filter(toks, x -> x IN ('der','die','und','das','ist','ein','zu'))) AS INT) AS score_de,
        |  CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','que','un','est'))) AS INT) AS score_fr
        |  FROM d)
        |SELECT doc_id, lang, source, n_chars, score_en, score_es, score_de, score_fr,
        |  CASE
        |    WHEN score_en > 0 AND score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |    WHEN score_es > 0 AND score_es > score_en AND score_es >= score_de AND score_es >= score_fr THEN 'es'
        |    WHEN score_de > 0 AND score_de > score_en AND score_de > score_es AND score_de >= score_fr THEN 'de'
        |    WHEN score_fr > 0 AND score_fr > score_en AND score_fr > score_es AND score_fr > score_de THEN 'fr'
        |    ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    // LEFT JOIN + coalesce keeps empty-text docs in the output (unnest of
    // an empty range yields no rows, which would silently DROP the doc
    // from a bare GROUP BY; the Spark side emits fp=0 for empty text)
    "q46_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(sum(ascii(substr(text, i, 1)) * ((i * 2654435761) % 1000003)) AS BIGINT) AS fp
        |  FROM (SELECT doc_id, text, CAST(unnest(range(1, length(text) + 1)) AS INT) AS i
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(f.fp, 0) END AS fp
        |FROM documents d LEFT JOIN f USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // analytic ground truth for the REAL ImageIO decode: the synthetic
    // PNG's pixel channels are closed-form in (doc_id, x, y) — see
    // Multimodal.syntheticPng — so the oracle derives every decoded
    // statistic from doc_id without touching an image library. The
    // Spark side must round-trip actual PNG bytes to reproduce these.
    "q47_multimodal_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(2 + doc_id % 7 AS INT) AS width,
        |  CAST(2 + doc_id % 5 AS INT) AS height,
        |  round(doc_id % 199 + (1 + doc_id % 7) / 2.0, 4) AS mean_r,
        |  round((doc_id * 7) % 199 + (1 + doc_id % 5) / 2.0, 4) AS mean_g,
        |  round(CAST((doc_id * 13) % 199 AS DOUBLE), 4) AS mean_b
        |FROM documents ORDER BY asset_id""".stripMargin,
    // q47's closed forms restricted to the binary-source sample; the
    // decoy README.txt must never surface (pathGlobFilter) and every
    // sampled id must (a missing file or a mis-parsed filename id both
    // break the hash)
    "q127_binary_source" ->
      """SELECT doc_id AS asset_id,
        |  CAST(2 + doc_id % 7 AS INT) AS width,
        |  CAST(2 + doc_id % 5 AS INT) AS height,
        |  round(doc_id % 199 + (1 + doc_id % 7) / 2.0, 4) AS mean_r,
        |  round((doc_id * 7) % 199 + (1 + doc_id % 5) / 2.0, 4) AS mean_g,
        |  round(CAST((doc_id * 13) % 199 AS DOUBLE), 4) AS mean_b
        |FROM documents WHERE doc_id % 37 = 0 ORDER BY asset_id""".stripMargin,
    // analytic ground truth for the REAL javax.sound decode: the WAV's
    // PCM ramp is closed-form in (doc_id, i) — Multimodal.syntheticWav
    "q100_audio_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
        |  round(doc_id % 1000 + 3 * (63 + doc_id % 64) / 2.0, 4) AS mean_amp,
        |  CAST(doc_id % 1000 + 3 * (63 + doc_id % 64) AS INT) AS peak_amp
        |FROM documents ORDER BY asset_id""".stripMargin,
    // resize oracle: output dims are max(1, d*3/max(w,h)) with the
    // source dims closed-form in doc_id; the blue channel is constant
    // per image, so its mean is invariant under the resample
    "q101_multimodal_resize" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 7 AS w, 2 + doc_id % 5 AS h
        |  FROM documents),
        |r AS (SELECT doc_id, w, h, greatest(w, h) AS m FROM d)
        |SELECT doc_id AS asset_id,
        |  CAST(CASE WHEN m <= 3 THEN w ELSE greatest(1, w * 3 // m) END AS INT) AS width,
        |  CAST(CASE WHEN m <= 3 THEN h ELSE greatest(1, h * 3 // m) END AS INT) AS height,
        |  round(CAST((doc_id * 13) % 199 AS DOUBLE), 4) AS mean_b
        |FROM r ORDER BY asset_id""".stripMargin,
    // analytic ground truth for the REAL multi-frame GIF decode: frame
    // count and every sampled frame's solid color are closed-form in
    // (doc_id, frame_no) — Multimodal.syntheticGif. range(_, _, 2)
    // mirrors the every=2 sampling (frame 0 always included).
    "q102_video_frames" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS k,
        |    CAST(unnest(range(0, 2 + doc_id % 4, 2)) AS INT) AS frame_no
        |  FROM documents)
        |SELECT doc_id AS asset_id, k AS n_frames, frame_no,
        |  CAST(2 + doc_id % 7 AS INT) AS width,
        |  CAST(2 + doc_id % 5 AS INT) AS height,
        |  round(CAST((doc_id + 17 * frame_no) % 199 AS DOUBLE), 4) AS mean_r,
        |  round(CAST((doc_id * 7 + 23 * frame_no) % 199 AS DOUBLE), 4) AS mean_g,
        |  round(CAST((doc_id * 13 + 29 * frame_no) % 199 AS DOUBLE), 4) AS mean_b
        |FROM f ORDER BY asset_id, frame_no""".stripMargin,
    // mirrors sampleFrames: step = max(1, len div 4), min(4, len) frames,
    // 32-byte slices (text is single-byte chars, so substr == byte slice)
    "q54_multimodal_frames" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len,
        |    greatest(length(text) // 4, 1) AS step FROM documents),
        |f AS (SELECT doc_id, text, step,
        |    CAST(unnest(range(0, least(4, len))) AS INT) AS frame_no
        |  FROM d)
        |SELECT doc_id AS asset_id, frame_no,
        |  substr(text, frame_no * step + 1, 32) AS frame_str
        |FROM f ORDER BY asset_id, frame_no""".stripMargin,
    "q51_embed_dup_exact" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos FROM s WHERE cos >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q48_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings),
        |s AS (SELECT query_id, cand_id,
        |    round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS cos
        |  FROM q, c WHERE query_id <> cand_id),
        |r AS (SELECT query_id, cand_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
        |  FROM s)
        |SELECT query_id, cand_id, cos, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // mirrors TextAnalysis.gopherQuality: flags computed from the ROUNDED
    // signals (+1e-9 bias off .xxxx5 boundaries) so both engines agree on
    // boundary docs
    "q87_gopher_quality" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_words,
        |  round((length(text) - (CAST(len(toks) AS DOUBLE) - 1.0)) / CAST(len(toks) AS DOUBLE) + 0.000000001, 4) AS mean_word_len,
        |  round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) + 0.000000001, 4) AS alpha_frac,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','with','for'))) AS INT) AS stopword_n
        |FROM d)
        |SELECT *, (n_words >= 25 AND n_words <= 100000
        |  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |  AND alpha_frac >= 0.8 AND stopword_n >= 2) AS pass_gopher
        |FROM s ORDER BY doc_id""".stripMargin,
    // mirrors Dedup.removeDuplicateSpans (k=8): occurrences of a gram
    // ranked by (doc_id, pos); rn>1 = duplicate; covered positions
    // explode k-wide; survivors rebuilt in position order. The LEFT JOIN
    // + coalesce keeps fully-deduplicated docs in the output with ''.
    "q88_dup_span_removal" ->
      """WITH d AS (SELECT doc_id, trim(regexp_replace(text,'\s+',' ','g')) AS t FROM documents),
        |dd AS (SELECT doc_id, string_split(t,' ') AS toks FROM d),
        |tok AS (SELECT dd.doc_id, r.i AS pos, toks[CAST(r.i AS INT)] AS token
        |  FROM dd, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS i) r),
        |occ AS (SELECT dd.doc_id, r.i AS pos, array_to_string(toks[CAST(r.i AS INT):CAST(r.i+7 AS INT)],' ') AS gram
        |  FROM dd, LATERAL (SELECT unnest(range(1, len(toks)-8+2)) AS i) r
        |  WHERE len(toks) >= 8),
        |ranked AS (SELECT doc_id, pos, gram,
        |  row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM occ),
        |cov AS (SELECT DISTINCT ranked.doc_id, ranked.pos + g.j AS cpos
        |  FROM ranked, LATERAL (SELECT unnest(range(0,8)) AS j) g WHERE rn > 1),
        |kept AS (SELECT t.doc_id, t.pos, t.token FROM tok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |  WHERE c.doc_id IS NULL),
        |reb AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS cleaned_text,
        |  count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT dd.doc_id, CAST(len(dd.toks) AS INT) AS n_tokens,
        |  CAST(len(dd.toks) - coalesce(r.n_kept, 0) AS INT) AS n_removed,
        |  coalesce(r.cleaned_text, '') AS cleaned_text
        |FROM dd LEFT JOIN reb r ON dd.doc_id = r.doc_id ORDER BY dd.doc_id""".stripMargin)
}
