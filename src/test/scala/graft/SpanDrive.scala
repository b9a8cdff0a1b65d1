package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.TextOps

/** Stage-by-stage profile of the shared-span pipeline at a given SF. */
object SpanDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val spanTokens = 16
    val s = SparkSpec.session
    val docs = Tables.load(s, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val toks = TextOps.tokens(col("text"))
    val planted = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(100)) === 0,
        concat(col("text"), lit(" alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma")))
        .otherwise(col("text")).as("text"))
    // window-array variant: no string building; verify on array equality
    val winFrame = planted
      .select(col("doc_id").as("id"), toks.as("__t"))
      .filter(size(col("__t")) >= spanTokens)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("__t")) - (spanTokens - 1)),
        i => struct(i.as("pos"),
          slice(col("__t"), i, lit(spanTokens)).as("win")))).as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), col("pg.win").as("win"),
        xxhash64(col("pg.win")).as("h"))
    time("emit-wins")(winFrame.write.format("noop").mode("overwrite").save())
    val g = winFrame.persist(StorageLevel.MEMORY_AND_DISK)
    time("persist-wins")(g.write.format("noop").mode("overwrite").save())
    val ok = g.groupBy("h").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 100000).select("h")
    time("ok-agg")(ok.write.format("noop").mode("overwrite").save())
    val slim = g.join(ok, Seq("h"))
    val verified = slim
      .select(col("h"), col("id").as("id_a"), col("pos").as("pos_a"),
        col("win").as("w_a"))
      .join(slim.select(col("h"), col("id").as("id_b"),
        col("pos").as("pos_b"), col("win").as("w_b")), Seq("h"))
      .filter(col("id_a") < col("id_b") && col("w_a") === col("w_b"))
    val out = verified.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_spans"))
    time("join+agg-wins")(out.write.format("noop").mode("overwrite").save())
    val rows = out.count()
    println(s"PROF out-pairs: $rows")
    g.unpersist(false)
    time("full-op")(graft.operators.Dedup
      .sharedSpans(planted, "doc_id", "text", spanTokens = 16)
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
