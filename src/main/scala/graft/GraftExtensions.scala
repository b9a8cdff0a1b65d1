package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine installable with
  * no code — `--conf spark.sql.extensions=graft.GraftExtensions` — by
  * injecting the Hive-gap functions and the stats-answering optimizer
  * rule into every session built from that config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (graft.functions.HiveCompat.registrations ++
      graft.functions.BitmapExpressions.registrations ++
      graft.functions.BloomExpressions.registrations ++
      graft.functions.CountMinExpressions.registrations ++
      graft.functions.HeavyHitterExpressions.registrations).foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
    ext.injectOptimizerRule(s => graft.plans.StatsCountRule(s))
    // Hive-1.2 CHAR/VARCHAR overflow truncates on insert instead of
    // raising EXCEED_LIMIT_LENGTH (see HiveCharTruncateRule scaladoc)
    ext.injectPostHocResolutionRule(s =>
      graft.plans.HiveCharTruncateRule(s))
  }
}
