package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Hive-compat scalar functions that Spark 4 lacks, built by composing
  * codegen'd built-in Catalyst expressions (translate/substring/concat/if)
  * rather than UDFs, so they stay inside whole-stage codegen and scale.
  *
  * Reference inventory (ql/exec/FunctionRegistry.java):
  *  - field                :255  (GenericUDFField)
  *  - mask, mask_first_n, mask_last_n, mask_show_first_n, mask_show_last_n,
  *    mask_hash            :463-468 (HDP/Ranger additions, ql/udf/generic/
  *    GenericUDFMask*.java — upper→X, lower→x, digit→n string transforms)
  *  - in_file              :425  (GenericUDFInFile — membership in a file's
  *    line set)
  *  - create_union         :405  (UNIONTYPE constructor; encoded here as
  *    struct<tag:int, field0.., fieldN..> per SURVEY §1.2)
  */
object HiveCompat {

  private val UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val LOWER = "abcdefghijklmnopqrstuvwxyz"
  private val DIGIT = "0123456789"

  /** Constant-char arg (Hive requires mask replacement chars be constants). */
  private def constChar(e: Expression, default: String): String = {
    require(e.foldable, s"mask replacement must be a constant, got $e")
    val v = e.eval()
    if (v == null) default else {
      val s = v.toString
      // Hive passes -1 to mean "leave this class unmasked"
      if (s == "-1") null else s.substring(0, 1)
    }
  }

  /** translate()-chain masking every char class: upper→X lower→x digit→n. */
  private def maskAll(e: Expression, up: String, lo: String, dg: String,
      other: String = null): Expression = {
    def tr(in: Expression, from: String, to: String) =
      if (to == null) in
      else StringTranslate(in, Literal(from), Literal(to.head.toString * from.length))
    val masked = tr(tr(tr(e, UPPER, up), LOWER, lo), DIGIT, dg)
    // otherChar: every NON-alphanumeric character (ref GenericUDFMask
    // transformChar default branch). The alnum-class replacements
    // above emit alnum chars, so applying it afterwards is safe.
    if (other == null) masked
    else RegExpReplace(masked, Literal("[^\\p{L}\\p{Nd}]"),
      Literal(java.util.regex.Matcher.quoteReplacement(other.head.toString)))
  }

  private def maskArgs(rest: Seq[Expression]): (String, String, String) = {
    val up = if (rest.nonEmpty) constChar(rest(0), "X") else "X"
    val lo = if (rest.length > 1) constChar(rest(1), "x") else "x"
    val dg = if (rest.length > 2) constChar(rest(2), "n") else "n"
    (up, lo, dg)
  }

  private def substrTo(e: Expression, from: Expression, len: Expression) =
    Substring(e, from, len)
  private val END = Literal(Int.MaxValue)

  /** Constant int argument (accepts int literals and digit strings —
    * Hive's getIntArg does both); `dflt` when absent. */
  private def constInt(e: Expression, dflt: Int): Int = {
    require(e.foldable, s"mask argument must be a constant, got $e")
    val v = e.eval()
    if (v == null) dflt
    else
      try v.toString.toInt
      catch { case _: NumberFormatException => dflt }
  }

  /** mask(value[, upper, lower, digit, other, number, day, month,
    * year]) — full GenericUDFMask surface: strings mask by character
    * class (incl. the non-alnum otherChar), integral types rebuild
    * the value from `number` digits with the input type's overflow
    * wrap (the reference accumulates in the narrow type), dates set
    * day/month(0-based)/year(offset 1900) fields, -1 retaining each.
    * Out-of-range args fall back to the reference defaults
    * (GenericUDFMask.init). */
  def mask(args: Seq[Expression]): Expression = {
    val value = args.head
    value.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        var num = if (args.length > 5) constInt(args(5), 1) else 1
        if (num < 0 || num > 9) num = 1
        // digits → num, rebuilt with the input type's wraparound
        Cast(Cast(StringTranslate(Cast(value, StringType),
          Literal(DIGIT), Literal(num.toString * 10)), LongType),
          value.dataType)
      case DateType =>
        var day = if (args.length > 6) constInt(args(6), 1) else 1
        if (day != -1 && (day < 1 || day > 31)) day = 1
        var month = if (args.length > 7) constInt(args(7), 0) else 0
        if (month != -1 && (month < 0 || month > 11)) month = 0
        val year = if (args.length > 8) constInt(args(8), 0) else 0
        def pick(masked: Int, offset: Int, orig: Expression): Expression =
          if (masked == -1) orig else Literal(masked + offset)
        MakeDate(
          pick(year, 1900, Year(value)),
          pick(month, 1, Month(value)),
          pick(day, 0, DayOfMonth(value)))
      case _ =>
        val (up, lo, dg) = maskArgs(args.tail)
        val other = if (args.length > 4) constChar(args(4), null) else null
        maskAll(value, up, lo, dg, other)
    }
  }

  private def maskedNumberArg(args: Seq[Expression], idx: Int): Int = {
    var v = if (args.length > idx) constInt(args(idx), 1) else 1
    if (v < 0 || v > 9) v = 1
    v
  }

  /** Date transform shared by all mask variants (MaskTransformer
    * .transform(Date)): day/month(0-based)/year(1900-offset) at
    * `idx..idx+2`, -1 retains, out-of-range falls to defaults 1/0/0. */
  private def maskDateExpr(value: Expression, args: Seq[Expression],
      idx: Int): Expression = {
    var day = if (args.length > idx) constInt(args(idx), 1) else 1
    if (day != -1 && (day < 1 || day > 31)) day = 1
    var month = if (args.length > idx + 1) constInt(args(idx + 1), 0) else 0
    if (month != -1 && (month < 0 || month > 11)) month = 0
    val year = if (args.length > idx + 2) constInt(args(idx + 2), 0) else 0
    def pick(masked: Int, offset: Int, orig: Expression): Expression =
      if (masked == -1) orig else Literal(masked + offset)
    MakeDate(
      pick(year, 1900, Year(value)),
      pick(month, 1, Month(value)),
      pick(day, 0, DayOfMonth(value)))
  }

  /** Integral transform for the N-variants: mask `k` digits from the
    * first or last side with `num`, rebuilt with the input type's
    * overflow wrap (ref MaskFirstNTransformer etc. accumulate in the
    * narrow type). `fromShow` flips k to (digitCount - n) — the show
    * variants mask the complement. */
  private def maskIntegralDigits(value: Expression, num: Int,
      firstSide: Boolean, fromShow: Boolean, n0: Expression): Expression = {
    val n = Cast(n0, IntegerType)
    val astr = Cast(Abs(Cast(value, LongType)), StringType)
    val dc = Length(astr)
    val k0 = if (fromShow) Subtract(dc, n) else n
    val k = Greatest(Seq(Literal(0), Least(Seq(k0, dc))))
    val repeatPart = StringRepeat(Literal(num.toString), k)
    val digits =
      if (firstSide)
        Concat(Seq(repeatPart, Substring(astr, Add(k, Literal(1)), END)))
      else
        Concat(Seq(Substring(astr, Literal(1), Subtract(dc, k)), repeatPart))
    val signed = Concat(Seq(
      If(LessThan(Cast(value, LongType), Literal(0L)),
        Literal("-"), Literal("")), digits))
    Cast(Cast(signed, LongType), value.dataType)
  }

  private def maskN(args: Seq[Expression], firstSide: Boolean,
      fromShow: Boolean)(stringImpl: => Expression): Expression =
    args.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        maskIntegralDigits(args.head, maskedNumberArg(args, 6),
          firstSide, fromShow, args(1))
      case DateType => maskDateExpr(args.head, args, 7)
      case _ => stringImpl
    }

  /** mask_first_n(str, n, ...) — mask the first n chars, keep the rest. */
  def maskFirstN(args: Seq[Expression]): Expression =
    maskN(args, firstSide = true, fromShow = false) {
      val (e, n) = (args.head, args(1))
      val (up, lo, dg) = maskArgs(args.drop(2))
      val other = if (args.length > 5) constChar(args(5), null) else null
      Concat(Seq(
        maskAll(substrTo(e, Literal(1), n), up, lo, dg, other),
        substrTo(e, Add(n, Literal(1)), END)))
    }

  /** mask_last_n(str, n, ...) — mask the last n chars, keep the rest. */
  def maskLastN(args: Seq[Expression]): Expression =
    maskN(args, firstSide = false, fromShow = false) {
      val (e, n) = (args.head, args(1))
      val (up, lo, dg) = maskArgs(args.drop(2))
      val other = if (args.length > 5) constChar(args(5), null) else null
      val len = Length(e)
      If(LessThanOrEqual(len, n),
        maskAll(e, up, lo, dg, other),
        Concat(Seq(
          substrTo(e, Literal(1), Subtract(len, n)),
          maskAll(substrTo(e, Add(Subtract(len, n), Literal(1)), END),
            up, lo, dg, other))))
    }

  /** mask_show_first_n(str, n, ...) — keep first n chars, mask the rest. */
  def maskShowFirstN(args: Seq[Expression]): Expression =
    maskN(args, firstSide = false, fromShow = true) {
      val (e, n) = (args.head, args(1))
      val (up, lo, dg) = maskArgs(args.drop(2))
      val other = if (args.length > 5) constChar(args(5), null) else null
      Concat(Seq(
        substrTo(e, Literal(1), n),
        maskAll(substrTo(e, Add(n, Literal(1)), END), up, lo, dg, other)))
    }

  /** mask_show_last_n(str, n, ...) — keep last n chars, mask the rest. */
  def maskShowLastN(args: Seq[Expression]): Expression =
    maskN(args, firstSide = true, fromShow = true) {
      val (e, n) = (args.head, args(1))
      val (up, lo, dg) = maskArgs(args.drop(2))
      val other = if (args.length > 5) constChar(args(5), null) else null
      val len = Length(e)
      If(LessThanOrEqual(len, n),
        e,
        Concat(Seq(
          maskAll(substrTo(e, Literal(1), Subtract(len, n)), up, lo, dg,
            other),
          substrTo(e, Add(Subtract(len, n), Literal(1)), END))))
    }

  /** mask_hash(str) — md5 hex digest for string-family input; any
    * OTHER type returns NULL rather than hashing its text form
    * (GenericUDFMaskHash.initialize accepts only string/char/varchar;
    * udf_mask_hash golden pins NULL for tinyint..bigint and date). */
  def maskHash(args: Seq[Expression]): Expression = {
    val a = args.head
    val stringLike =
      try a.dataType match {
        case StringType => true
        case _: org.apache.spark.sql.types.CharType => true
        case _: org.apache.spark.sql.types.VarcharType => true
        case _ => false
      } catch { case _: Exception => true }
    if (stringLike) {
      // HiveChar.toString is the PADDED value, so a char(n) input
      // hashes with its trailing spaces (udf_mask_hash golden col 3)
      val padded =
        try a.dataType match {
          case c: org.apache.spark.sql.types.CharType =>
            StringRPad(Cast(a, StringType), Literal(c.length), Literal(" "))
          case _ => a
        } catch { case _: Exception => a }
      Md5(Cast(padded, BinaryType))
    } else Literal(null, StringType)
  }

  /** field(x, v1, v2, ...) — 1-based index of x among v1..vn, 0 if absent
    * or x is NULL (GenericUDFField semantics). */
  def field(args: Seq[Expression]): Expression =
    Coalesce(Seq(
      ArrayPosition(CreateArray(args.tail), args.head),
      Literal(0L)))

  /** create_union(tag, v0, v1, ...) — UNIONTYPE as struct<tag, field0..>. */
  def createUnion(args: Seq[Expression]): Expression = {
    val fields = Seq(Literal("tag"), args.head) ++
      args.tail.zipWithIndex.flatMap { case (e, i) =>
        Seq(Literal(s"field$i"), e)
      }
    CreateNamedStruct(fields)
  }

  // in_file: per-JVM cache of file line sets; executors re-load lazily (the
  // file must be visible cluster-wide, same contract as Hive's in_file).
  private val fileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  def lookupFile(path: String): Set[String] =
    fileCache.computeIfAbsent(path, p =>
      scala.io.Source.fromFile(p).getLines().toSet)

  /** in_file(str, filename) — true iff str equals a full line of the file.
    * Evaluated as InSet (hash-set membership, same as Hive's
    * GenericUDFInFile), not an In(literal...) chain: a million-line file
    * must not become a million-node expression tree. */
  def inFile(args: Seq[Expression]): Expression = {
    require(args(1).foldable, "in_file filename must be a constant")
    val path = args(1).eval().toString
    val lines = lookupFile(path)
    // InSet skips the analyzer's implicit coercion (the old In(literal…)
    // form cast a non-string probe to string) — cast explicitly so
    // in_file(n_nationkey, f) compares "7" = "7", not Int vs UTF8String
    InSet(Cast(args.head, StringType),
      lines.map(l => org.apache.spark.unsafe.types.UTF8String.fromString(l): Any))
  }


  /** Hive's hash() — ref ql/udf/generic/GenericUDFHash.java, which
    * folds ObjectInspectorUtils.hashCode per argument with a 31-mix
    * (Java hashCode semantics per type), NOT Murmur3 like Spark's
    * built-in hash. Spark's catalyst HiveHash expression is bit-exact
    * for most primitives but DIVERGES from Hive 1.2 on DECIMAL
    * (HiveDecimal normalizes — BigDecimal.stripTrailingZeros — before
    * BigDecimal.hashCode) and BINARY (BytesWritable.hashCode =
    * WritableComparator.hashBytes, a 31-fold seeded with 1), so
    * hive_hash is a full replica of the 1.2 switch
    * (serde ObjectInspectorUtils.hashCode:526-600; probe:
    * vector_data_types.q SUM(HASH(*)) over decimal/binary columns). */
  private def hiveHash(children: Seq[Expression]): Expression =
    HiveLegacyHash(children)
  /** Hive's struct() names its fields col1..colN regardless of the
    * argument expressions (ref udf/generic/GenericUDFStruct.java:55 —
    * fname = "col" + (i+1)); Spark's keeps source column names, so
    * max(struct(key, value)) would render {"key":..} where the
    * reference prints {"col1":..} (udf_max.q, udf_min.q goldens). */
  private def hiveStruct(children: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(
      children.zipWithIndex.flatMap { case (c, i) =>
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          s"col${i + 1}"), c)
      })
  /** Hive's hour/minute/second (ref udf/UDFHour.java etc.) parse string
    * arguments as "yyyy-MM-dd HH:mm:ss" then "HH:mm:ss" and return NULL
    * when neither carries a time part — a bare date string gives NULL,
    * where Spark's cast-to-timestamp path gives 0 (udf_hour.q golden). */
  private def hiveTimeField(fn: Seq[Expression] => Expression)(
      children: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val e = children.head
    CaseWhen(
      Seq((RLike(Cast(e, org.apache.spark.sql.types.StringType),
        Literal("^\\s*\\d{4}-\\d{2}-\\d{2}\\s*$")),
        Literal.create(null, org.apache.spark.sql.types.IntegerType))),
      fn(children))
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hour" -> hiveTimeField(c =>
      org.apache.spark.sql.catalyst.expressions.Hour(c.head)) _,
    "minute" -> hiveTimeField(c =>
      org.apache.spark.sql.catalyst.expressions.Minute(c.head)) _,
    "second" -> hiveTimeField(c =>
      org.apache.spark.sql.catalyst.expressions.Second(c.head)) _,
    "mask" -> mask _,
    "mask_first_n" -> maskFirstN _,
    "mask_last_n" -> maskLastN _,
    "mask_show_first_n" -> maskShowFirstN _,
    "mask_show_last_n" -> maskShowLastN _,
    "mask_hash" -> maskHash _,
    "hive_hash" -> hiveHash _,
    // reached via GraftSession.hiveStructCompat — `struct(` is a grammar
    // token in Spark's parser, so the registry alone can't override it
    "hive_struct" -> hiveStruct _,
    // reached via GraftSession front-door rewrite (the registry name
    // must not shadow functions.percentile_approx — the quantile
    // selection path brackets ranks with Spark's native sketch)
    "hive_percentile_approx" -> HivePercentileApprox.build _,
    "field" -> field _,
    "create_union" -> createUnion _,
    "in_file" -> inFile _,
    // Hive 1.2 aes_encrypt/aes_decrypt (ref udf/generic/
    // GenericUDFAesEncrypt.java): AES/ECB/PKCS5Padding — deterministic,
    // so the goldens pin exact ciphertext (Spark's default GCM mode
    // salts with a random IV) — and an invalid key LENGTH returns NULL
    // instead of erroring (udf_aes_encrypt's 17-byte key rows)
    "aes_encrypt" -> hiveAes(decrypt = false) _,
    "aes_decrypt" -> hiveAes(decrypt = true) _
  )

  private def hiveAes(decrypt: Boolean)(
      children: Seq[Expression]): Expression = {
    val name = if (decrypt) "aes_decrypt" else "aes_encrypt"
    // ADVICE r13: explicit arity check (ref GenericUDFAesBase raises
    // UDFArgumentLengthException) instead of an opaque MatchError /
    // silently ignored extras
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"$name requires 2 arguments, got ${children.length}")
    val Seq(input, key) = children
    val keyBin = Cast(key, BinaryType)
    val op: Expression =
      if (decrypt)
        AesDecrypt(Cast(input, BinaryType), keyBin,
          Literal("ECB"), Literal("PKCS"), Literal(Array.emptyByteArray))
      else
        AesEncrypt(Cast(input, BinaryType), keyBin,
          Literal("ECB"), Literal("PKCS"),
          Literal(Array.emptyByteArray), Literal(Array.emptyByteArray))
    CaseWhen(Seq((
      In(Length(keyBin), Seq(Literal(16), Literal(24), Literal(32))),
      op)), Literal.create(null, BinaryType))
  }

  def register(spark: SparkSession): Unit =
    (registrations ++ BitmapExpressions.registrations ++
      BloomExpressions.registrations ++
      CountMinExpressions.registrations ++
      HeavyHitterExpressions.registrations ++
      TopKExpressions.registrations).foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, b, "scala_udf")
    }
}
