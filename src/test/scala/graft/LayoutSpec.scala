package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout clustering: bit-interleave correctness, the aligned-block
  * locality guarantee, bucket-cover math, and end-to-end partition pruning
  * of a two-column range query after a z-clustered write. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (column 0 even positions, column 1 odd)") {
    // x=0b101, y=0b011 → z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq($"x", $"y"), bits = 3))
      .collect().head.getLong(0)
    assert(z == 27L)
  }

  test("z-clustered buckets are aligned blocks bounding EVERY dimension") {
    // full 32×32 grid, 5 bits/dim, 4 bucket bits → 16 buckets, each an
    // exactly 8×8 block (x-span = y-span = 8) — the property a one-column
    // sort cannot give (sorting by x alone leaves y-span = 32 everywhere)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val clustered = Layout.clusterByZOrder(grid, Seq("x", "y"), bits = 5, bucketBits = 4)
    val spans = clustered.groupBy("z_bucket")
      .agg(countDistinct("x", "y").as("n"),
        (max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    spans.foreach { r =>
      assert(r.getLong(1) == 64L, s"bucket ${r.getLong(0)} not 64 cells")
      assert(r.getLong(2) == 7L && r.getLong(3) == 7L,
        s"bucket ${r.getLong(0)} spans ${r.getLong(2)}×${r.getLong(3)}, want 7×7")
    }
  }

  test("zBucketsFor covers exactly the buckets intersecting the query rect") {
    // the 8×8 block at origin is one aligned bucket
    assert(Layout.zBucketsFor(Seq((0L, 7L), (0L, 7L)), 5, 4) == Seq(0L))
    // a rect crossing the x=16 boundary at y<8 touches two blocks
    val two = Layout.zBucketsFor(Seq((12L, 20L), (0L, 7L)), 5, 4)
    assert(two.size == 2, s"got $two")
    // the full grid touches all 16
    assert(Layout.zBucketsFor(Seq((0L, 31L), (0L, 31L)), 5, 4).size == 16)
    // an empty-intersection rect (beyond the grid) touches the max block only
    assert(Layout.zBucketsFor(Seq((31L, 31L), (31L, 31L)), 5, 4) == Seq(15L))
  }

  test("two-column range scan over a z-clustered write prunes partitions") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    Layout.clusterByZOrder(grid, Seq("x", "y"), bits = 5, bucketBits = 4)
      .write.partitionBy("z_bucket").parquet(out)
    val t = spark.read.parquet(out)
    val buckets = Layout.zBucketsFor(Seq((0L, 7L), (8L, 15L)), 5, 4)
    assert(buckets.size == 1)
    val q = t.filter($"z_bucket".isin(buckets: _*) &&
      $"x".between(0, 7) && $"y".between(8, 15))
    val rows = q.collect()
    assert(rows.length == 64) // full 8×8 block
    val scan = q.queryExecution.executedPlan.toString
    // static partition pruning: only the covered bucket's directory is read
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    val files = q.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.forall(_.contains(s"z_bucket=${buckets.head}")),
      s"read outside the covered bucket: ${files.mkString(",")}")
  }
}
