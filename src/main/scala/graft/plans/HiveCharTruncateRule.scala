package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, StringRPad, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.CharVarcharCodegenUtils

/** Hive-1.2 insert semantics for CHAR/VARCHAR overflow: values longer
  * than the declared length are TRUNCATED on write, never rejected
  * (ref serde2/typeinfo: HiveVarchar/HiveChar enforceMaxLength via
  * `getHiveVarchar(...).setValue(s, maxLength)` — truncation by
  * character count; schema_evol_* and parquet_types goldens pin rows
  * whose varchar columns arrived through exactly that truncation).
  * Spark's ANSI-style write-side check raises EXCEED_LIMIT_LENGTH
  * instead, as a `StaticInvoke` of CharVarcharCodegenUtils planted by
  * TableOutputResolver on every insert into a CHAR/VARCHAR column.
  *
  * This post-hoc resolution rule rewrites those check expressions into
  * plain truncating forms — `substring(v, 1, n)` for VARCHAR and
  * `rpad(substring(v, 1, n), n, ' ')` for CHAR (Spark stores CHAR
  * blank-padded; only the overflow branch changes) — keeping the whole
  * expression inside codegen with no error path. Disable with
  * `spark.graft.hive.charTruncate=false` to restore Spark's check.
  */
case class HiveCharTruncateRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = session.conf
    .get("spark.graft.hive.charTruncate", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformAllExpressions {
      case si: StaticInvoke
          if si.staticObject == classOf[CharVarcharCodegenUtils] &&
            si.functionName == "varcharTypeWriteSideCheck" =>
        truncate(si.arguments.head, si.arguments(1))
      case si: StaticInvoke
          if si.staticObject == classOf[CharVarcharCodegenUtils] &&
            si.functionName == "charTypeWriteSideCheck" =>
        val n = si.arguments(1)
        StringRPad(truncate(si.arguments.head, n), n, Literal(" "))
    }
  }

  private def truncate(v: Expression, n: Expression): Expression =
    Substring(v, Literal(1), n)
}
