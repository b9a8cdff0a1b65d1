package graft
object WinProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    import s.implicits._
    Seq(("a",1),("a",2),("b",3)).toDF("k","v").createOrReplaceTempView("t")
    def tryQ(q: String): Unit =
      try { val r = s.sql(q).collect().mkString("; "); println(s"OK  [$q] -> $r") }
      catch { case e: Exception => println(s"ERR [$q] -> ${e.getMessage.take(140)}") }
    tryQ("select row_number() over (order by 1) from t")
    tryQ("select row_number() over (order by 'x') from t")
    tryQ("select rank() over (partition by k order by k) from t")
    tryQ("select sum(v) over () from t")
    tryQ("select k, max(v) over (partition by k order by k range unbounded preceding) from t")
    tryQ("select lag(v) over (partition by k order by k) from t")
    tryQ("select k, sum(v) over (partition by k order by v range between 1 preceding and 1 following) from t")
    tryQ("select k, first_value(v) over (partition by k order by cast(k as string) range between 1 preceding and 1 following) from t")
  }
}
