package graft

import org.apache.spark.sql.SparkSession

/** Registration point for the function-gap surface: everything Hive 1.2's
  * FunctionRegistry (ref: ql/exec/FunctionRegistry.java:179-468) has that
  * Spark 4 lacks gets registered here so `spark.sql` resolves it by name.
  * Filled in by graft.functions.* as operators land.
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    graft.functions.HiveCompat.register(spark)
  }
}
