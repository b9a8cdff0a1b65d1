package graft.functions

import org.apache.spark.sql.SparkSession

/** Hive-compat scalar functions that Spark 4 lacks, built by composing
  * codegen'd built-in expressions (translate/substr/concat) rather than
  * UDFs, so they stay inside whole-stage codegen.
  *
  * Reference inventory: ql/exec/FunctionRegistry.java:463-468 (mask_*),
  * :255 (field), :425 (in_file).
  */
object HiveCompat {
  def register(spark: SparkSession): Unit = {
    // filled in as functions land (mask_*, field, in_file, ngrams, ...)
  }
}
