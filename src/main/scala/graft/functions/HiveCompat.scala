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
  private def maskAll(e: Expression, up: String, lo: String, dg: String): Expression = {
    def tr(in: Expression, from: String, to: String) =
      if (to == null) in
      else StringTranslate(in, Literal(from), Literal(to.head.toString * from.length))
    tr(tr(tr(e, UPPER, up), LOWER, lo), DIGIT, dg)
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

  /** mask(str[, upper, lower, digit]) — whole-string mask. */
  def mask(args: Seq[Expression]): Expression = {
    val (up, lo, dg) = maskArgs(args.tail)
    maskAll(args.head, up, lo, dg)
  }

  /** mask_first_n(str, n, ...) — mask the first n chars, keep the rest. */
  def maskFirstN(args: Seq[Expression]): Expression = {
    val (e, n) = (args.head, args(1))
    val (up, lo, dg) = maskArgs(args.drop(2))
    Concat(Seq(
      maskAll(substrTo(e, Literal(1), n), up, lo, dg),
      substrTo(e, Add(n, Literal(1)), END)))
  }

  /** mask_last_n(str, n, ...) — mask the last n chars, keep the rest. */
  def maskLastN(args: Seq[Expression]): Expression = {
    val (e, n) = (args.head, args(1))
    val (up, lo, dg) = maskArgs(args.drop(2))
    val len = Length(e)
    If(LessThanOrEqual(len, n),
      maskAll(e, up, lo, dg),
      Concat(Seq(
        substrTo(e, Literal(1), Subtract(len, n)),
        maskAll(substrTo(e, Add(Subtract(len, n), Literal(1)), END), up, lo, dg))))
  }

  /** mask_show_first_n(str, n, ...) — keep first n chars, mask the rest. */
  def maskShowFirstN(args: Seq[Expression]): Expression = {
    val (e, n) = (args.head, args(1))
    val (up, lo, dg) = maskArgs(args.drop(2))
    Concat(Seq(
      substrTo(e, Literal(1), n),
      maskAll(substrTo(e, Add(n, Literal(1)), END), up, lo, dg)))
  }

  /** mask_show_last_n(str, n, ...) — keep last n chars, mask the rest. */
  def maskShowLastN(args: Seq[Expression]): Expression = {
    val (e, n) = (args.head, args(1))
    val (up, lo, dg) = maskArgs(args.drop(2))
    val len = Length(e)
    If(LessThanOrEqual(len, n),
      e,
      Concat(Seq(
        maskAll(substrTo(e, Literal(1), Subtract(len, n)), up, lo, dg),
        substrTo(e, Add(Subtract(len, n), Literal(1)), END))))
  }

  /** mask_hash(str) — md5 hex digest (GenericUDFMaskHash). */
  def maskHash(args: Seq[Expression]): Expression =
    Md5(Cast(args.head, BinaryType))

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
  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mask" -> mask _,
    "mask_first_n" -> maskFirstN _,
    "mask_last_n" -> maskLastN _,
    "mask_show_first_n" -> maskShowFirstN _,
    "mask_show_last_n" -> maskShowLastN _,
    "mask_hash" -> maskHash _,
    "hive_hash" -> hiveHash _,
    "field" -> field _,
    "create_union" -> createUnion _,
    "in_file" -> inFile _
  )

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
