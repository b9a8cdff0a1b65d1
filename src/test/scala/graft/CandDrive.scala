package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.TextOps

/** Interleaved A/B of the two candidatePairs shapes (join vs collect_list)
  * over the full minhash pipeline, alternating within one JVM to cancel
  * warmup/ordering bias. */
object CandDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val s = SparkSpec.session
    val docs = Tables.load(s, dir, "documents")

    def pipeline(shape: String): Long = {
      val shingled = docs
        .select(col("doc_id").as("id"),
          TextOps.shingleSet(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val banded = shingled.select(col("id"),
          posexplode(TextOps.bandHashes(
            TextOps.minhashSignature(col("shingles"), 64), 16)))
        .select(col("id"), col("pos").as("band"), col("col").as("key"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cand: DataFrame = shape match {
        case "join" =>
          val sized = banded.groupBy("band", "key")
            .agg(count(lit(1)).as("bucket_n"))
            .filter(col("bucket_n").between(2, 1000))
          val pruned = banded.join(sized, Seq("band", "key"))
            .select(col("band"), col("key"), col("id"))
          val l = pruned.select(col("band"), col("key"), col("id").as("id_a"))
          val r = pruned.select(col("band"), col("key"), col("id").as("id_b"))
          l.join(r, Seq("band", "key"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        case "agg" =>
          val buckets = banded.groupBy("band", "key")
            .agg(collect_list(col("id")).as("ids"))
            .filter(size(col("ids")).between(2, 1000))
          buckets
            .select(col("ids"), posexplode(col("ids")).as(Seq("i", "x")))
            .select(explode(transform(
              slice(col("ids"), col("i") + lit(2), size(col("ids"))),
              y => struct(least(col("x"), y).as("id_a"),
                greatest(col("x"), y).as("id_b")))).as("p"))
            .select(col("p.id_a"), col("p.id_b"))
            .distinct()
      }
      val a = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
      val b = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
      val verified = cand.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      val t0 = System.nanoTime()
      val out = verified.localCheckpoint(true)
      val n = out.count()
      println(f"AB $shape: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
      shingled.unpersist(true); banded.unpersist(true)
      out.unpersist(true)
      n
    }
    for (_ <- 1 to 3) { pipeline("join"); pipeline("agg") }
    s.stop()
  }
}
