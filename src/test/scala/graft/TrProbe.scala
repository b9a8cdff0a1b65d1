package graft
object TrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val variants = Seq(
      """SELECT TRANSFORM(*) USING 'tr "\001" _' AS (c, d) FROM tp""",
      """SELECT TRANSFORM(*) USING 'tr \\\\t _' AS (c, d) FROM tp""",
      """SELECT TRANSFORM(*) USING "tr \"\t\" _" AS (c, d) FROM tp""",
      """SELECT TRANSFORM(*) USING 'tr "\t" _' AS (c, d) FROM tp""")
    spark.sql("SELECT 86 AS key, 'val_86' AS value").createOrReplaceTempView("tp")
    variants.foreach { q =>
      try {
        val r = spark.sql(q).collect().map(r => s"${r.getString(0)}/${r.getString(1)}").mkString("|")
        println(s"PROBE [${q.drop(26).take(30)}] -> [$r]")
      } catch { case e: Exception => println(s"PROBE [${q.drop(26).take(30)}] ERR ${Option(e.getMessage).getOrElse("").take(80)}") }
    }
  }
}
