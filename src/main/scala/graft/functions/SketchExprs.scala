package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass sketch expressions (same rationale as [[VecDot]]:
  * the HOF formulations are interpreted and re-traverse their input once
  * per hash/bit; these generate one tight loop inside whole-stage
  * codegen).
  */
object SketchExprs {

  /** xxhash64 with Spark's SQL-function seed — bit-identical to the
    * `xxhash64(col)` expression the HOF versions used. */
  def tokenHash(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)

  def minhashSig(hashed: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(hashed), numHashes))

  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))

  def topBigramCount(tokens: Column): Column =
    GraftSqlBridge.column(TopBigramCount(GraftSqlBridge.expression(tokens)))

  def charGramMinhash(text: Column, k: Int, numHashes: Int): Column =
    GraftSqlBridge.column(CharGramMinHash(GraftSqlBridge.expression(text), k, numHashes))

  def wordGramMinhash(text: Column, k: Int, numHashes: Int): Column =
    GraftSqlBridge.column(WordGramMinHash(GraftSqlBridge.expression(text), k, numHashes))

  private val P = 1000000007L

  /** Update every affine-permutation minimum with one gram hash — the
    * shared inner step of [[charGramSig]] / [[wordGramSig]] (arithmetic
    * identical to [[MinHashSig]], so fused and chained signatures are
    * bit-identical). */
  private def feedMins(mins: Array[Long], raw: Long): Unit = {
    var h = raw % P
    if (h < 0) h += P
    var j = 0
    while (j < mins.length) {
      var v = (h * (2L * j + 1) + (12345L * j + 7)) % P
      if (v < 0) v += P
      if (v < mins(j)) mins(j) = v
      j += 1
    }
  }

  /** MinHash signature straight off WORD k-grams of a space-separated
    * text, without materializing gram strings: on a normalized document
    * the k-gram joined with " " IS a contiguous byte range of the text
    * (UTF-8 multibyte sequences never contain 0x20, so byte-scanning
    * for spaces segments ANY script correctly), and xxhash64 of that
    * byte range is bit-identical to hashing the concatenated gram
    * string. One boundary scan + one hash per gram, zero allocation
    * beyond the signature itself; duplicates need no array_distinct
    * (min is duplicate-insensitive). Texts with fewer than k tokens
    * hash as one whole-text gram, mirroring Dedup.shingles. */
  def wordGramSig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < nBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens < k) {
      feedMins(mins, org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off, nBytes, 42L))
    } else {
      val starts = new Array[Int](nTokens)
      var t = 1
      i = 0
      while (i < nBytes) {
        if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
          starts(t) = i + 1; t += 1
        }
        i += 1
      }
      var g = 0
      while (g <= nTokens - k) {
        val start = starts(g)
        val end = if (g + k < nTokens) starts(g + k) - 1 else nBytes
        feedMins(mins, org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + start, end - start, 42L))
        g += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** MinHash signature straight off a sliding character window: for each
    * k-char gram, xxhash64 (seed 42, byte-identical to the SQL function)
    * mod P feeds the same affine-permutation minima as [[MinHashSig]] —
    * no gram array, no array_distinct (min is duplicate-insensitive), no
    * intermediate hashed array. ASCII text (numBytes == numChars) hashes
    * byte windows in place with ZERO allocation; multi-byte text falls
    * back to per-gram substrings. Texts shorter than k hash as one whole-
    * text gram, mirroring Dedup.charShingles. Callable from codegen. */
  def charGramSig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    def feed(raw: Long): Unit = feedMins(mins, raw)
    val nChars = s.numChars()
    if (nChars < k) {
      feed(tokenHash(s))
    } else if (s.numBytes() == nChars) {
      // pure ASCII: char windows ARE byte windows — hash slices in place
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i <= nChars - k) {
        feed(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + i, k, 42L))
        i += 1
      }
    } else {
      var i = 1
      while (i <= nChars - k + 1) {
        feed(tokenHash(s.substringSQL(i, k)))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Max multiplicity over the ADJACENT PAIRS of a token array, without
    * materializing pair strings: sort pair indices with a (first, second)
    * comparator, count the longest equal run. Tokens come from a
    * split-on-space, so they never contain the separator and pair
    * equality coincides with joined-string equality — the oracle's
    * `t[i] || ' ' || t[i+1]` semantics, EXACTLY (string comparison, not
    * hashes — a hash collision would silently overcount against an
    * oracle). Callable from generated code (static forwarder). */
  def topBigram(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val idx = new Array[Integer](n - 1)
    i = 0
    while (i < n - 1) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val c = toks(x.intValue()).compareTo(toks(y.intValue()))
        if (c != 0) c else toks(x.intValue() + 1).compareTo(toks(y.intValue() + 1))
      }
    })
    def samePair(x: Int, y: Int): Boolean =
      toks(x).equals(toks(y)) && toks(x + 1).equals(toks(y + 1))
    var best = 1L
    var run = 1L
    i = 1
    while (i < n - 1) {
      if (samePair(idx(i).intValue(), idx(i - 1).intValue())) {
        run += 1
        if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }
}

/** MinHash signature: `numHashes` minima of affine permutations
  * `(h·(2j+1) + 12345j+7) mod P` over a column of already-hashed
  * shingles (`array<long>`). One traversal computes every minimum —
  * the `aggregate`/`transform` HOF equivalent traverses the array
  * 2×numHashes times and allocates an intermediate array per hash.
  * Arithmetic (long wrap-around, pmod) replicates the HOF expression
  * exactly, so signatures are bit-identical. Empty input yields
  * Long.MaxValue sentinels (the HOF yielded nulls; shingle sets are
  * never empty by construction). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  private val P = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        var v = (h * (2L * j + 1) + (12345L * j + 7)) % P
        if (v < 0) v += P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * (2L * $j + 1L) + (12345L * $j + 7L)) % ${P}L;
         |    if ($v < 0) $v += ${P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of the most frequent adjacent token pair (the Gopher repetition
  * kernel), fused over the TOKEN array: no per-bigram string is ever
  * allocated. The HOF formulation — build bigram strings, array_sort, an
  * aggregate fold building a (prev, run, best) struct PER ELEMENT — is
  * interpreted and allocation-bound; this is one index sort + one pass in
  * a compiled helper invoked from whole-stage codegen (see
  * [[SketchExprs.topBigram]] for the joined-string-equality argument). */
case class TopBigramCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_bigram_count requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override protected def nullSafeEval(input: Any): Any =
    SketchExprs.topBigram(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.topBigram($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-signature fusion of charShingles → hashShingles → MinHashSig
  * for the char-gram LSH path (see [[SketchExprs.charGramSig]]): one
  * sliding-window pass per document instead of three materialized
  * array projections. Same-data A/B (q56, sf0.1, best-of-2 × 2 runs):
  * fused 3.46/3.53 s vs unfused chain 4.79/4.16 s — ~25% faster; the
  * earlier cross-round "regression" was a regenerated corpus. */
case class CharGramMinHash(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chargram_minhash requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_minhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchExprs.charGramSig(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.charGramSig($a, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-signature fusion of shingles → hashShingles → MinHashSig for
  * the WORD-gram LSH path (see [[SketchExprs.wordGramSig]] for the
  * byte-range argument): one boundary scan + one hash per gram instead
  * of three materialized array projections (token array, gram-string
  * array, hashed array) per document. Signatures are bit-identical to
  * the chained form (pinned in GraftFunctionsSpec). */
case class WordGramMinHash(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_gram_minhash requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_minhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchExprs.wordGramSig(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.wordGramSig($a, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: bit i is set when the sum over token
  * occurrences of ±1 (sign = bit i of xxhash64(token)) is positive.
  * One pass with 64 on-stack counters — the HOF fold allocated a fresh
  * 64-long array plus an index array per TOKEN. Hashing matches the SQL
  * `xxhash64` (seed 42), so hashes are bit-identical to the HOF form. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = SketchExprs.tokenHash(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = graft.functions.SketchExprs.tokenHash($a.getUTF8String($i));
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
