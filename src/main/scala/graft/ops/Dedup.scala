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

  /** Exact n-gram Jaccard similarity pairs >= threshold.
    *
    * Implementation: explode distinct shingles, self-join on shingle
    * (bounded by shingle posting-list sizes — at web scale you'd first
    * drop ultra-common shingles, which `maxDocFreq` does), count
    * intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    */
  def jaccardPairs(
      df: DataFrame,
      threshold: Double,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Long = 1000000L): DataFrame = {
    val sizes = df.select(
      col(idCol).as("id"),
      shingles(normalize(col(textCol)), k).as("sh"))
      .withColumn("setsize", size(col("sh")))
    val posts = sizes
      .select(col("id"), col("setsize"), explode(col("sh")).as("shingle"))
    // drop shingles whose posting list is too hot (stop-shingle removal —
    // the skew guard that makes this survive 100 TB)
    val freq = posts.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
    val filtered = posts.join(freq, "shingle")
    val inter = filtered.as("a")
      .join(filtered.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.setsize").as("size_a"), col("b.setsize").as("size_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------- MinHash

  private val P = 1000000007L

  /** MinHash signature column: array of `numHashes` minima of affine
    * permutations of xxhash64(shingle). Fixed coefficients ⇒ deterministic. */
  def minhashSignature(shingleCol: Column, numHashes: Int = 32): Column = {
    val base = transform(shingleCol, s => pmod(xxhash64(s), lit(P)))
    val sigs = (0 until numHashes).map { j =>
      val a = 2L * j + 1
      val b = 12345L * j + 7
      array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(P))))
    }
    array(sigs: _*)
  }

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
      textCol: String = "text"): DataFrame = {
    val numHashes = bands * rowsPerBand
    val docs = df.select(
      col(idCol).as("id"),
      shingles(normalize(col(textCol)), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = docs.select(
      col("id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token multiset: bit i of the hash is set when the
    * count-weighted sum of (±1 per token, sign = bit i of xxhash64(token))
    * is positive. Pure higher-order-function fold — no UDF, no explode. */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    val withCounts = transform(
      array_distinct(toks),
      t => struct(
        xxhash64(t).as("h"),
        size(filter(toks, x => x === t)).cast("long").as("cnt")))
    // accumulate per-bit counterweights in an array[64] of longs
    val zeros = array_repeat(lit(0L), 64)
    val sums = aggregate(
      withCounts,
      zeros,
      (acc, tc) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(
          call_function("shiftright", tc.getField("h"), i.cast("int"))
            .bitwiseAND(1) === 1,
          tc.getField("cnt")).otherwise(-tc.getField("cnt"))))
    // fold bits back into one long
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)), (s, i) =>
        when(s > 0, call_function("shiftleft", lit(1L), i.cast("int")))
          .otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Near-dup pairs with SimHash hamming distance <= maxHamming, found by
    * 4×16-bit band blocking (pigeonhole: distance <= 3 guarantees at least
    * one identical band) + exact bit_count verification. */
  def simhashPairs(
      df: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4-band blocking guarantees recall only for distance <= 3")
    val hashed = df.select(col(idCol).as("id"), simhash(normalize(col(textCol))).as("sh"))
    val banded = hashed.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sh"), (b * 16).cast("int"))
          .bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
