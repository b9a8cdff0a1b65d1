package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.TextOps

/** Stage-by-stage profile of the MinHash-LSH near-dup pipeline at a given SF. */
object MinhashDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val s = SparkSpec.session
    val docs = Tables.load(s, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val (shingleSize, numHashes, bands) = (3, 64, 16)
    time("scan-only")(docs.select(col("doc_id"))
      .write.format("noop").mode("overwrite").save())
    val shingled = docs
      .select(col("doc_id").as("id"),
        TextOps.shingleSet(col("text"), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingle-emit")(shingled
      .write.format("noop").mode("overwrite").save())
    val sh = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    time("shingle-persist")(sh.count())
    val banded = sh.select(col("id"),
        posexplode(TextOps.bandHashes(
          TextOps.minhashSignature(col("shingles"), numHashes), bands)))
      .select(col("id"), col("pos").as("band"), col("col").as("key"))
    time("sig+band-emit")(banded.write.format("noop").mode("overwrite").save())
    val bp = banded.persist(StorageLevel.MEMORY_AND_DISK)
    time("band-persist")(bp.count())
    val sized = bp.groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, 100000))
    val pruned = bp.join(sized, Seq("band", "key"))
      .select(col("band"), col("key"), col("id"))
    val l = pruned.select(col("band"), col("key"), col("id").as("id_a"))
    val r = pruned.select(col("band"), col("key"), col("id").as("id_b"))
    val rawPairs = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    println("raw candidate rows: " + time("raw-pairs-count")(rawPairs.count()))
    val cand = rawPairs.distinct()
    println("distinct candidates: " + time("cand-distinct")(cand.count()))
    val cp = cand.persist(StorageLevel.MEMORY_AND_DISK)
    cp.count()
    val a = sh.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    val verified = cp.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    println("verified pairs: " + time("verify")(verified.count()))

    // variant: one collect_list aggregation replaces sized+join+self-join
    val buckets = bp.groupBy("band", "key")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 100000))
    val pairsV = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    println("variant raw pairs: " + time("v-raw-pairs")(pairsV.count()))
    val candV = pairsV.distinct()
    println("variant distinct: " + time("v-distinct")(candV.count()))
    val cpv = candV.persist(StorageLevel.MEMORY_AND_DISK)
    cpv.count()
    val verifiedV = cpv.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    println("variant verified: " + time("v-verify")(verifiedV.count()))

    // variant 2: first-matching-band emit — no distinct needed.
    // Each banded row carries the doc's full band-key array; a pair is
    // emitted from bucket (band, key) only when no earlier band has
    // matching keys (bucket membership == key equality, so "first shared
    // bucket" is exact, not approximate).
    val banded2 = sh.select(col("id"),
        TextOps.bandHashes(
          TextOps.minhashSignature(col("shingles"), numHashes), bands)
          .as("keys"))
      .select(col("id"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "key")))
    val buckets2 = banded2.groupBy("band", "key")
      .agg(collect_list(struct(col("id"), col("keys"))).as("ds"))
      .filter(size(col("ds")).between(2, 100000))
    val pairs2 = buckets2
      .select(col("band"), explode(flatten(transform(col("ds"), (x, i) =>
        filter(
          transform(slice(col("ds"), i + lit(2), size(col("ds"))),
            y => struct(
              least(x("id"), y("id")).as("id_a"),
              greatest(x("id"), y("id")).as("id_b"),
              (size(filter(zip_with(
                slice(x("keys"), lit(1), col("band")),
                slice(y("keys"), lit(1), col("band")),
                (p, q) => p === q), b => b)) === 0).as("first"))),
          st => st("first"))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    println("v2 pairs (no distinct): " + time("v2-pairs")(pairs2.count()))
    val cp2 = pairs2.persist(StorageLevel.MEMORY_AND_DISK)
    cp2.count()
    val verified2 = cp2.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    println("v2 verified: " + time("v2-verify")(verified2.count()))

    // variant 3: two-level emit — posexplode each bucket member, pair it
    // with later members only; per-row array bounded by bucket size (not
    // its square), so oversized-but-capped buckets can't make a giant row.
    val pairs3 = buckets
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "x")))
      .select(explode(transform(
        slice(col("ids"), col("i") + lit(2), size(col("ids"))),
        y => struct(least(col("x"), y).as("id_a"),
          greatest(col("x"), y).as("id_b")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    println("v3 raw pairs: " + time("v3-raw-pairs")(pairs3.count()))
    val candV3 = pairs3.distinct()
    println("v3 distinct: " + time("v3-distinct")(candV3.count()))
    s.stop()
  }
}
