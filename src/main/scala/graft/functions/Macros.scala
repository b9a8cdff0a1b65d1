package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.DataType

/** Hive SQL macros — `CREATE TEMPORARY MACRO name(p TYPE, ...) body` /
  * `DROP TEMPORARY MACRO name` (reference:
  * ql/parse/MacroSemanticAnalyzer.java:71-75, grammar TOK_CREATEMACRO /
  * TOK_DROPMACRO in ql/parse/HiveParser.g).
  *
  * Spark-first realization: a macro is pure expression substitution, so it
  * registers as a FunctionRegistry builder that parses the body ONCE and, at
  * each call site, grafts the argument expressions into the body tree in
  * place of the parameter references. The result is ordinary Catalyst
  * expressions — constant-folded, pushed down, and whole-stage-codegen'd
  * exactly as if the user had written the expansion inline. No UDF, no
  * interpretation overhead, no closure capture.
  *
  * Hive-matching rules enforced at create time (MacroSemanticAnalyzer):
  * duplicate parameter names are rejected, and every column reference in the
  * body must be one of the declared parameters (a macro body cannot capture
  * table columns). Arguments are cast to the declared parameter types, which
  * is how Hive's typed macro signature behaves.
  */
object Macros {

  /** Create (or replace) a session macro. Parameter types are SQL type
    * strings (`"double"`, `"decimal(12,2)"`, ...). */
  def create(
      spark: SparkSession,
      name: String,
      params: Seq[(String, String)],
      bodySql: String): Unit = {
    val parser = spark.sessionState.sqlParser
    val typed: Seq[(String, DataType)] =
      params.map { case (p, t) => (p.toLowerCase, parser.parseDataType(t)) }
    require(typed.map(_._1).distinct.size == typed.size,
      s"macro $name: duplicate parameter name")

    val body = parser.parseExpression(bodySql)
    val paramSet = typed.map(_._1).toSet
    val free = body.collect {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        a.nameParts.head.toLowerCase
    }.toSet
    val unknown = free -- paramSet
    require(unknown.isEmpty,
      s"macro $name body references non-parameter columns: " +
        unknown.mkString(", "))

    val arity = typed.length
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == arity,
        s"macro $name expects $arity arguments, got ${args.length}")
      val sub: Map[String, Expression] =
        typed.zip(args).map { case ((p, dt), a) => p -> Cast(a, dt) }.toMap
      body.transformUp {
        case a: UnresolvedAttribute if a.nameParts.length == 1 &&
            sub.contains(a.nameParts.head.toLowerCase) =>
          sub(a.nameParts.head.toLowerCase)
      }
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }

  /** DROP TEMPORARY MACRO name. Returns whether it existed. */
  def drop(spark: SparkSession, name: String): Boolean =
    spark.sessionState.functionRegistry.dropFunction(FunctionIdentifier(name))

  private val CreateRe =
    """(?is)\s*CREATE\s+TEMPORARY\s+MACRO\s+(\w+)\s*\(([^)]*)\)\s*(.+)""".r
  private val DropRe =
    """(?is)\s*DROP\s+TEMPORARY\s+MACRO\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r

  /** Front-door for the Hive statement forms themselves (Spark's parser does
    * not accept them): `CREATE TEMPORARY MACRO name(a TYPE, b TYPE) body`
    * and `DROP TEMPORARY MACRO [IF EXISTS] name`. */
  def sql(spark: SparkSession, stmt: String): Unit = stmt match {
    case CreateRe(name, paramList, body) =>
      val params = paramList.trim match {
        case "" => Seq.empty[(String, String)]
        case s =>
          s.split(",").toSeq.map { decl =>
            val parts = decl.trim.split("\\s+", 2)
            require(parts.length == 2,
              s"macro parameter needs 'name TYPE', got '$decl'")
            (parts(0), parts(1))
          }
      }
      create(spark, name, params, body)
    case DropRe(name) => drop(spark, name)
    case other =>
      throw new IllegalArgumentException(s"not a macro statement: $other")
  }
}
