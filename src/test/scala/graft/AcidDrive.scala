package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Measures the ACID snapshot's read overhead against a plain parquet
  * scan of the same data (`sbt "Test/runMain graft.AcidDrive"`): adopt
  * sf0.1 lineitem in place, mutate ~1%, and compare full-scan aggregate
  * latency before deltas, with deltas, and after major compaction.
  * Numbers land in SCALE.md — measured, not asserted. */
object AcidDrive {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = Files.createTempDirectory("graft-acid-drive").toString
    Tables.load(s, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(t)

    def time[A](what: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"DRIVE $what%-28s ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      r
    }

    val plain = time("plain parquet scan") {
      s.read.parquet(t).agg(sum("l_quantity")).collect().head.getDouble(0)
    }
    val adopted = time("acid snapshot (originals)") {
      Acid.snapshot(s, t).agg(sum("l_quantity")).collect().head.getDouble(0)
    }
    assert(plain == adopted, "adoption must not change the data")

    Acid.deleteTxn(s, t, "l_orderkey % 100 = 7")
    Acid.updateTxn(s, t, Map("l_quantity" -> "l_quantity + 1"),
      "l_orderkey % 100 = 8")
    val n = time("acid snapshot (2 deltas)") {
      Acid.snapshot(s, t).count()
    }
    Acid.compactMajor(s, t)
    Acid.clean(t)
    val n2 = time("acid snapshot (compacted)") {
      Acid.snapshot(s, t).count()
    }
    assert(n == n2, "compaction must not change the data")
    println(s"DRIVE rows=$n")

    // -- delta pileup: the read-amplification bound ---------------------
    // Stack single-statement deltas and measure the snapshot scan as
    // they accumulate; then run the Initiator heuristic (minDeltas=10)
    // and measure again. The claim under test at sf1: read cost grows
    // with ACTIVE delta count and the Initiator caps it — the scan
    // after maybeCompact+clean must return to ~the compacted baseline.
    (1 to 12).foreach { i =>
      Acid.deleteTxn(s, t, s"l_orderkey % 997 = $i")
      if (i % 4 == 0) {
        val t0 = System.nanoTime()
        val c = Acid.snapshot(s, t).count()
        println(f"DRIVE pileup deltas=$i%2d scan ${(System.nanoTime() - t0) / 1e6}%8.0f ms rows=$c")
      }
    }
    val action = Acid.maybeCompact(s, t)
    Acid.clean(t)
    println(s"DRIVE initiator action=$action")
    val n3 = time("acid snapshot (post-initiator)") {
      Acid.snapshot(s, t).count()
    }
    println(s"DRIVE rows post-initiator=$n3")
    import scala.reflect.io.Directory
    new Directory(new java.io.File(t)).deleteRecursively()
    s.stop()
  }
}
