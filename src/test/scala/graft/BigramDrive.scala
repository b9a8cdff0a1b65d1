package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Stage-by-stage profile of the bigram-LM scoring pipeline at a given SF. */
object BigramDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val s = SparkSpec.session
    val docs = Tables.load(s, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val toks = TextOps.tokens(col("text"))
    time("scan-only")(docs.select(col("doc_id"))
      .write.format("noop").mode("overwrite").save())
    time("tokenize")(docs.select(col("doc_id"), toks.as("t"))
      .write.format("noop").mode("overwrite").save())
    val stream = docs
      .select(col("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) >= 1)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__t"))),
        i => struct(element_at(col("__t"), i).as("w1"),
          when(i < size(col("__t")), element_at(col("__t"), i + 1))
            .as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    time("stream-emit")(stream.write.format("noop").mode("overwrite").save())
    val counts = stream.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    time("counts-agg")(counts.write.format("noop").mode("overwrite").save())
    val n = time("counts-rows")(counts.count())
    println(s"PROF distinct (w1,w2): $n")
    time("full")(graft.operators.TextAnalysis
      .bigramNll(docs, "doc_id", "text")
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
