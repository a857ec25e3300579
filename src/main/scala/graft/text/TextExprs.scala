package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-sketch hot paths. The composed Column
  * forms (regexp_extract_all → `transform` shingle building →
  * per-element hashing) are HOFs — CodegenFallback, interpreted per
  * lambda step, and the dominant cost of the dedup suite at sf0.1.
  * These expressions compute the identical values in one JVM pass and
  * stay inside whole-stage codegen (same pattern as rag.L2Normalize /
  * rag.HashEmbed; equality with the HOF forms is spec-asserted).
  *
  * Hash basis shared with the DuckDB oracle: word regex
  * `[A-Za-z0-9]+`, shingle = 3 words joined by one space, 60-bit hash
  * = first 15 hex digits of sha256 (Dedup.shingleHash /
  * HashEmbedder.tokenHash compute the same).
  */
object TextKernels {

  private val WordPattern = java.util.regex.Pattern.compile(Dedup.WordRegex)

  private[text] def words(text: String): Array[String] = {
    val m = WordPattern.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result().toArray
  }

  private val Sha = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** first 60 bits of sha256(s), as in `substr(sha256(s),1,15)::BIGINT`:
    * 15 hex digits = the first 8 digest bytes as a big-endian unsigned
    * long, dropped low nibble — computed without the hex-string
    * round-trip (zero transient allocations besides the digest), and
    * with a thread-local MessageDigest. Shared by every sha-derived
    * kernel (shingles, simhash words, the hash embedder) so the hash
    * basis cannot drift between them.
    */
  def hash60(s: String): Long = {
    val md = Sha.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** one pass over the words: count, summed lengths, and per-list
    * lowercase membership hits — the kernel behind [[WordStats]].
    * Returns an InternalRow(n_words: Int, sum_word_len: Long,
    * hits: ArrayData[Int]).
    */
  def wordStats(text: UTF8String,
      sets: Array[java.util.HashSet[String]]): org.apache.spark.sql.catalyst.InternalRow = {
    val w = words(if (text == null) "" else text.toString)
    var sumLen = 0L
    val hits = new Array[Int](sets.length)
    var i = 0
    while (i < w.length) {
      sumLen += w(i).length
      val lw = w(i).toLowerCase(java.util.Locale.ROOT)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(lw)) hits(j) += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      w.length, sumLen, ArrayData.toArrayData(hits))
  }

  /** 60-bit hashes of the word n-shingles (optionally of the distinct
    * shingle STRINGS — distinct is taken before hashing, mirroring the
    * oracle's `list_distinct` on strings). Empty below n words.
    */
  def shingleHashes(text: UTF8String, distinct: Boolean, n: Int = 3): ArrayData = {
    val w = words(if (text == null) "" else text.toString)
    if (w.length < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val count = w.length - n + 1
    val sb = new java.lang.StringBuilder(64)
    val seen = if (distinct) new java.util.LinkedHashSet[String]() else null
    val out = new scala.collection.mutable.ArrayBuffer[Long](count)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen == null) out += hash60(s)
      else if (seen.add(s)) out += hash60(s)
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** full MinHash signature in one pass: sig[i] = min over shingles of
    * mix60(hash60(s) ⊕ seed_i) — identical values to
    * Dedup.signatureCol / the relational explode+min-agg path (the
    * JVM mix here is the wrapping-multiply twin of Dedup.mix60,
    * spec-asserted equal). Empty array below 3 words (no shingles).
    */
  def minhashSig(text: UTF8String): ArrayData = {
    val w = words(if (text == null) "" else text.toString)
    if (w.length < 3) return ArrayData.toArrayData(Array.emptyLongArray)
    val k = Dedup.NumHashes
    val seeds = Dedup.Seeds.toArray
    val sig = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < w.length - 2) {
      sb.setLength(0)
      sb.append(w(i)).append(' ').append(w(i + 1)).append(' ').append(w(i + 2))
      val h = hash60(sb.toString)
      var j = 0
      while (j < k) {
        val v = mix60Jvm(h ^ seeds(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** JVM twin of Dedup.mix60: wrapping multiply masked to 60 bits ≡
    * multiply mod 2^60 (2^60 | 2^64)
    */
  private[text] def mix60Jvm(z0: Long): Long = {
    var z = z0
    z = ((z ^ (z >>> 30)) * Dedup.MixC1) & Dedup.Mask60
    z = ((z ^ (z >>> 27)) * Dedup.MixC2) & Dedup.Mask60
    z ^ (z >>> 31)
  }

  /** 60-bit SimHash over word tokens — identical votes/threshold rule
    * as Dedup.simhashCol: bit b set iff Σ over word hashes of
    * ((h>>b)&1 ? +1 : −1) is positive.
    */
  def simhash(text: UTF8String): Long = {
    val w = words(if (text == null) "" else text.toString)
    val votes = new Array[Int](Dedup.SimBits)
    // natural text repeats words heavily — memoize the sha256 per
    // distinct word within the row (same value, fewer digests)
    val memo = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < w.length) {
      val h = memo.computeIfAbsent(w(i), s => hash60(s)).longValue()
      var b = 0
      while (b < Dedup.SimBits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Dedup.SimBits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Unicode NFC normalization — the pre-tokenization canonical form
    * (é as one codepoint and e + combining acute must tokenize, hash,
    * and dedup identically). JDK Normalizer computes the same Unicode
    * NFC the oracle's ICU `nfc_normalize` does.
    *
    * Fast path ordering matters on this map-side hot loop: ASCII bytes
    * are NFC by construction, so a pure byte scan (no UTF-16 decode,
    * no allocation at all) returns the input for the dominant all-ASCII
    * case; only rows with a high byte pay the String round-trip, and
    * of those, already-normalized ones still skip the second copy.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = s.getByte(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}

/** text → struct(n_words, sum_word_len, hits: array<int>) in one
  * native pass — the word-level stats the quality/language operators
  * need. The composed Column forms (`aggregate` length fold for mean
  * word length, `filter`+`isInCollection` per stopword list) are
  * interpreted HOFs and dominated the score-consuming queries
  * (group_median/quality_filter ≈ 1.2 s at sf0.1, ~6× the pruned
  * projection). hits(i) counts LOWERCASED words contained in lists(i)
  * — identical values to TextOps.hits.
  */
case class WordStats(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    lists: Seq[Seq[String]]) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireString(prettyName, child.dataType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lists.map { l =>
      val s = new java.util.HashSet[String]()
      l.foreach(s.add)
      s
    }.toArray

  override def nullSafeEval(s: Any): Any =
    TextKernels.wordStats(s.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("wordStatsSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, a =>
      s"(org.apache.spark.sql.catalyst.InternalRow) graft.text.TextKernels$$.MODULE$$.wordStats($a, $setsRef)")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** text → array<long> of 60-bit word n-shingle hashes (native
  * one-pass; n = shingle width in words).
  */
case class ShingleHashes(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    distinct: Boolean, n: Int = 3) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires shingle width n >= 1, got $n")
    else TextExprs.requireString(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextKernels.shingleHashes(s.asInstanceOf[UTF8String], distinct, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) graft.text.TextKernels$$.MODULE$$.shingleHashes($a, $distinct, $n)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** text → array<long> MinHash signature (native one-pass; empty below
  * 3 words).
  */
case class MinHashSig(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireString(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextKernels.minhashSig(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) graft.text.TextKernels$$.MODULE$$.minhashSig($a)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** text → Unicode-NFC text (native; no-copy fast path for already-
  * normalized input).
  */
case class NfcNormalize(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireString(prettyName, child.dataType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextKernels.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.text.TextKernels$$.MODULE$$.nfcNormalize($a)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** text → 60-bit SimHash (native one-pass). */
case class SimHash60(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireString(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextKernels.simhash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.text.TextKernels$$.MODULE$$.simhash($a)")

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

object TextExprs {
  import org.apache.spark.sql.GraftExprBridge._

  /** analysis-time type gate shared by the text kernels (wrong-typed
    * SQL args get an AnalysisException, not a runtime ClassCast)
    */
  private[graft] def requireString(fn: String, dt: DataType): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires a STRING argument, got ${dt.catalogString}")

  def shingleHashes(text: Column, distinct: Boolean, n: Int = 3): Column =
    toColumn(ShingleHashes(toExpression(text), distinct, n))

  def wordStats(text: Column, lists: Seq[Seq[String]]): Column =
    toColumn(WordStats(toExpression(text), lists))

  def minhashSig(text: Column): Column =
    toColumn(MinHashSig(toExpression(text)))

  def simhash(text: Column): Column =
    toColumn(SimHash60(toExpression(text)))

  def nfcNormalize(text: Column): Column =
    toColumn(NfcNormalize(toExpression(text)))
}
