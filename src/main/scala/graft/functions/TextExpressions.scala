package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** text_profile(text) → struct of raw per-row text statistics, computed
  * in ONE pass over the string: char count, [a-z0-9]-run token count and
  * summed token length (on the lowercased text — identical semantics to
  * `split(lower(text), '[^a-z0-9]+')`), ASCII punctuation/digit/upper
  * counts (Java `\p{Punct}` class), per-language stopword hits, and CJK
  * presence. TextAnalysis.qualityMetrics/langId derive their ratios and
  * argmax from this single struct — previously each metric embedded its
  * own interpreted higher-order-function tree (lambda ExprIds differ per
  * instance, so common-subexpression elimination never merged them).
  *
  * Codegen: the expression instance (which owns the stopword hash sets)
  * is installed as a codegen reference object and the generated code
  * calls its compiled `profile` method — no CodegenFallback node, so
  * the surrounding projection stays in one whole-stage function. */
case class TextProfile(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("has_cjk", BooleanType, nullable = false)))
  override def nullIntolerant: Boolean = true

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    profiles.map { words =>
      val s = new java.util.HashSet[String](words.size * 2)
      words.foreach(s.add)
      s
    }.toArray

  @inline private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
  @inline private def isLowerAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** One-pass profile; called from both execution paths (public so the
    * generated code can reach it through the reference object). */
  def profile(input: UTF8String): InternalRow = {
    val raw = input.toString
    var nPunct = 0; var nDigit = 0; var nUpper = 0; var hasCjk = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isPunct(c)) nPunct += 1
      if (c >= '0' && c <= '9') nDigit += 1
      if (c >= 'A' && c <= 'Z') nUpper += 1
      if (c >= '一' && c <= '鿿') hasCjk = true
      i += 1
    }
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    var nToks = 0; var sumTokLen = 0L
    val counts = new Array[Int](sets.length)
    i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !isLowerAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < len && isLowerAlnum(s.charAt(i))) i += 1
      if (i > start) {
        nToks += 1
        sumTokLen += i - start
        val tok = s.substring(start, i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) counts(j) += 1
          j += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](raw.codePointCount(0, raw.length), nToks, sumTokLen,
        nPunct, nDigit, nUpper,
        UnsafeArrayData.fromPrimitiveArray(counts), hasCjk))
  }

  override protected def nullSafeEval(input: Any): Any =
    profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textProfile", this,
      classOf[TextProfile].getName)
    defineCodeGen(ctx, ev, c => s"$ref.profile($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_counts(text) → struct<n_ws:int, n_bpe:int> in one pass:
  * whitespace-delimited token count (runs of non-`\s`) and the BPE-ish
  * count (letter runs + digit runs + each single other non-space char —
  * the `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` alternation without
  * materializing the match array per row). Codegen emits a static call
  * to the compiled scanner. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenCounts.evalString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenCounts.evalString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Static one-pass scanner shared by both execution paths. */
  def evalString(input: UTF8String): InternalRow = {
    val s = input.toString
    var nWs = 0; var nBpe = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        nWs += 1
        while (i < len && !isWs(s.charAt(i))) {
          val c = s.charAt(i)
          nBpe += 1
          if (isLetter(c)) { while (i < len && isLetter(s.charAt(i))) i += 1 }
          else if (isDigit(c)) { while (i < len && isDigit(s.charAt(i))) i += 1 }
          // count one per CODE POINT, as the regex alternation does — a
          // surrogate pair (emoji) is one "other" token, not two
          else i += Character.charCount(s.codePointAt(i))
        }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWs, nBpe))
  }
}

/** nfc_normalize(text): Unicode canonical composition (NFC) — the
  * standard first step of text cleaning (decomposed "e"+U+0301 and
  * composed "é" must dedup/fingerprint/shingle identically). Spark has
  * no normalization built-in; this wraps `java.text.Normalizer` as a
  * native expression with a fast-path skip: already-NFC input (the
  * common case in real corpora) returns the original UTF8String after
  * one `isNormalized` scan, avoiding the normalize + re-encode
  * allocations. (The UTF8String→String decode itself is unavoidable —
  * Normalizer has no UTF8String/CharSequence-over-bytes view.)
  * Codegen emits a static call to the compiled normalizer.
  *
  * Reference seed: Hive's string canon functions (lower/upper et al.,
  * ql/udf/UDFLower.java) stop at case; NFC is the LLM-pipeline
  * extension of the same per-row shape.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.evalString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.evalString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def evalString(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Accent folding: NFD-decompose, drop combining marks (\p{Mn}), NFC
  * re-compose. café→cafe, Zürich→Zurich; non-decomposable letters (ß, ø)
  * pass through — the same contract as DuckDB/ICU `strip_accents`, which
  * the q178 oracle leans on. ASCII fast path: no decomposition, no copy.
  * Codegen emits a static call to the compiled folder. */
case class FoldAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    FoldAccents.evalString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FoldAccents.evalString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FoldAccents {
  private val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def evalString(u: UTF8String): UTF8String = {
    val s = u.toString
    var ascii = true
    var i = 0
    while (ascii && i < s.length) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) u
    else {
      val nfd = java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFD)
      val stripped = marks.matcher(nfd).replaceAll("")
      UTF8String.fromString(java.text.Normalizer.normalize(
        stripped, java.text.Normalizer.Form.NFC))
    }
  }
}
