package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry per implemented operator from SURVEY.md §2, with a DuckDB
  * oracle where the semantics are ANSI-SQL-expressible.
  *
  * Float determinism contract with the oracle: sums over doubles go through
  * exact DECIMAL arithmetic and are cast back to DOUBLE at the end
  * (`cast(sum(cast(x as decimal(18,2))) as double)`), so Spark and DuckDB
  * produce bit-identical doubles regardless of partial-aggregation order.
  * Averages are expressed as exact-decimal-sum / count (single double
  * division). Inherently order-sensitive stats (stddev/corr) are rounded.
  */
object Queries {
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Query whose Spark SQL and DuckDB SQL are the same text. */
  def dual(name: String, sql: String): Q =
    Q(name, (s, d) => { Tables.register(s, d); s.sql(sql) }, Some(sql))

  /** Query with divergent Spark-SQL vs DuckDB dialect text. */
  def sqlQ(name: String, sparkSql: String, oracleSql: String): Q =
    Q(name, (s, d) => { Tables.register(s, d); s.sql(sparkSql) }, Some(oracleSql))

  /** DataFrame-API query with a DuckDB oracle. */
  def dfQ(name: String, oracleSql: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, d) => { Tables.register(s, d); run(s, d) }, Some(oracleSql))

  /** Operator with no SQL-expressible oracle (driver does rows-only check). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, d) => { Tables.register(s, d); run(s, d) }, None)

  def all: Seq[Q] =
    RelationalQueries.all ++ WindowQueries.all ++ FunctionQueries.all ++
      PipelineQueries.all ++ SurfaceQueries.all ++ DepthQueries.all ++
      GapQueries.all ++ ScaleQueries.all ++ AnalyticsQueries.all ++
      Round5Queries.all ++ Round6Queries.all ++ Round7Queries.all ++
      Round8Queries.all

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
