package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** Stage-by-stage profile of the minhash dedup pipeline at a given SF. */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSpec.session
    val docs = Tables.load(s, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val shingled = docs.select(col("doc_id").as("id"),
      array_distinct(TextOps.wordNgrams(TextOps.tokens(col("text")), 3))
        .as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingle")(shingled.write.format("noop").mode("overwrite").save())
    val sigs = shingled.select(col("id"),
      TextOps.minhashSignature(col("shingles"), 64).as("sig"))
    time("minhash64")(sigs.write.format("noop").mode("overwrite").save())
    val banded = sigs
      .select(col("id"), posexplode(TextOps.bandHashes(col("sig"), 16)))
      .select(col("id"), col("pos").as("band"), col("col").as("key"))
    time("banding")(banded.write.format("noop").mode("overwrite").save())
    val sized = banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
    val big = time("bucket-sizes")(
      sized.filter(col("n") > 1).agg(sum(col("n") * col("n"))).collect())
    println("PROF pair-mass: " + big.head)
    val full = Dedup.minhashNearDups(docs, "doc_id", "text")
    time("full-pipeline")(full.write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
