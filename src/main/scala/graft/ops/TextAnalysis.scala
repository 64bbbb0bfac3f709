package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All are pure column expressions (whole-stage-codegen'd, no UDFs), so
  * they run as narrow maps over the scan at any scale — the 100 TB cost
  * is exactly one pass over the text column.
  */
object TextAnalysis {

  /** Tokens of a space-separated document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single symbols —
    * the standard cheap proxy for tokenizer token counts. */
  val bpeishPattern = "[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Language marker lists (tiny stopword sets). Deterministic heuristic:
    * score = number of token occurrences in each language's marker list;
    * prediction = argmax with fixed tie order en > es > de > fr, 'und' when
    * all scores are zero. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "que", "un", "est"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Predicted language + per-language scores. Adds columns
    * `score_<lang>`... and `lang_pred`. */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = langMarkers.foldLeft(df) { case (d, (lang, m)) =>
      d.withColumn(s"score_$lang", langScore(col(textCol), m))
    }
    // argmax with fixed order: a language wins iff its score is strictly
    // greater than every earlier language's and >= every later one's.
    val pred = langMarkers.zipWithIndex.foldRight(lit("und")) {
      case (((lang, _), i), elseCol) =>
        val s = col(s"score_$lang")
        val beatsEarlier = langMarkers.take(i)
          .map { case (l2, _) => s > col(s"score_$l2") }
          .foldLeft(lit(true))(_ && _)
        val beatsLater = langMarkers.drop(i + 1)
          .map { case (l2, _) => s >= col(s"score_$l2") }
          .foldLeft(lit(true))(_ && _)
        when(s > 0 && beatsEarlier && beatsLater, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Quality score in [0,1]: mixes document length, lexical diversity,
    * filler ratio and mean token length — the standard cheap pre-filter
    * shape for web-scale corpora. Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val fillerRatio =
      size(filter(toks, t => t.isin(lit("a"), lit("the")))).cast("double") / n
    val meanLen = (length(text) - (n - lit(1.0))) / n // single-space separated
    // the 1e-9 bias nudges scores off exact .xxxx5 rounding boundaries:
    // nice rational inputs land there exactly, and engines then disagree
    // (Spark rounds via the double's shortest decimal repr, DuckDB via
    // scaled multiply) — off-boundary, every engine rounds the same way
    round(
      least(n / lit(100.0), lit(1.0)) * 0.3 +
        distinctRatio * 0.3 +
        (lit(1.0) - fillerRatio) * 0.2 +
        least(meanLen / lit(8.0), lit(1.0)) * 0.2 +
        lit(1e-9),
      4)
  }

  /** Position-sensitive 64-bit document fingerprint: each character
    * contributes ascii(c) * w(pos) where w is a multiplicative-hash weight
    * of its 1-based position. Order-sensitive (an anagram fingerprints
    * differently), overflow-free for documents < ~50 MB, and expressible
    * in plain SQL for oracle checks. */
  def fingerprint(text: Column): Column = {
    val chars = split(text, "")
    val weighted = transform(chars, (c, i) =>
      ascii(c).cast("long") * pmod((i + lit(1)).cast("long") * lit(2654435761L), lit(1000003L)))
    aggregate(weighted, lit(0L), (acc, x) => acc + x)
  }

  /** Full analysis frame over a documents table. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val base = df
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish", bpeishCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
    withLangId(base, textCol)
  }
}
