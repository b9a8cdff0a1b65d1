package graft

import org.apache.spark.sql.Row

/** Specs for the Hive function-gap expressions (SURVEY §2.5; ref
  * ql/udf/generic/GenericUDFMask*.java, GenericUDFField.java,
  * GenericUDFInFile.java semantics). */
class HiveCompatSpec extends SparkSpec {

  private def one(sql: String): Row = spark.sql(sql).collect().head

  test("mask replaces upper/lower/digit classes") {
    assert(one("SELECT mask('Abc-123')").getString(0) == "Xxx-nnn")
  }

  test("mask honors custom replacement chars") {
    assert(one("SELECT mask('Abc-123', 'U', 'l', '#')").getString(0) == "Ull-###")
  }

  test("mask with -1 leaves a class unmasked") {
    assert(one("SELECT mask('Abc-123', 'X', 'x', '-1')").getString(0) == "Xxx-123")
  }

  test("mask_first_n masks only the prefix") {
    assert(one("SELECT mask_first_n('Customer#42', 4)").getString(0) == "Xxxxomer#42")
  }

  test("mask_last_n masks only the suffix") {
    assert(one("SELECT mask_last_n('Customer#42', 3)").getString(0) == "Customer#nn")
  }

  test("mask_last_n of short string masks everything") {
    assert(one("SELECT mask_last_n('ab1', 9)").getString(0) == "xxn")
  }

  test("mask_show_first_n keeps the prefix") {
    assert(one("SELECT mask_show_first_n('Customer#42', 4)").getString(0) == "Custxxxx#nn")
  }

  test("mask_show_last_n keeps the suffix") {
    assert(one("SELECT mask_show_last_n('Customer#42', 3)").getString(0) == "Xxxxxxxx#42")
  }

  test("mask_show_last_n of short string shows everything") {
    assert(one("SELECT mask_show_last_n('ab', 5)").getString(0) == "ab")
  }

  test("mask_hash is md5 hex") {
    assert(one("SELECT mask_hash('abc')").getString(0) ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("field returns 1-based index, 0 when absent, 0 on null") {
    assert(one("SELECT field('b', 'a', 'b', 'c')").getLong(0) == 2L)
    assert(one("SELECT field('z', 'a', 'b', 'c')").getLong(0) == 0L)
    assert(one("SELECT field(cast(null as string), 'a', 'b')").getLong(0) == 0L)
  }

  test("create_union encodes tag + fields as struct") {
    val r = one("SELECT create_union(1, 'str', 42)")
    val s = r.getStruct(0)
    assert(s.getInt(0) == 1)        // tag
    assert(s.getString(1) == "str") // field0
    assert(s.getInt(2) == 42)       // field1
  }

  test("in_file matches full lines of a file") {
    val f = java.io.File.createTempFile("infile", ".txt")
    java.nio.file.Files.writeString(f.toPath, "alpha\nbeta\n")
    try {
      assert(one(s"SELECT in_file('alpha', '${f.getAbsolutePath}')").getBoolean(0))
      assert(!one(s"SELECT in_file('alp', '${f.getAbsolutePath}')").getBoolean(0))
      // non-string probe is coerced to string (In-literal coercion parity)
      val nf = java.io.File.createTempFile("infile-num", ".txt")
      java.nio.file.Files.writeString(nf.toPath, "7\n42\n")
      try {
        assert(one(s"SELECT in_file(7, '${nf.getAbsolutePath}')").getBoolean(0))
        assert(!one(s"SELECT in_file(8, '${nf.getAbsolutePath}')").getBoolean(0))
      } finally nf.delete()
    } finally f.delete()
  }

  test("ewah_bitmap UDAF merges partial bitmaps across partitions") {
    import spark.implicits._
    // 200 keys spread over 8 partitions forces partial buffers + merge
    spark.range(0, 1000).select((($"id" % 200)).as("k"))
      .repartition(8).createOrReplaceTempView("bm_src")
    val r = spark.sql("""
      SELECT bitmap_count(ewah_bitmap(k)) AS ndv,
        ewah_bitmap_empty(ewah_bitmap(CASE WHEN k < 0 THEN k END)) AS e,
        bitmap_count(ewah_bitmap_and(
          ewah_bitmap(CASE WHEN k < 120 THEN k END),
          ewah_bitmap(CASE WHEN k >= 100 THEN k END))) AS inter,
        bitmap_count(ewah_bitmap_or(
          ewah_bitmap(CASE WHEN k < 50 THEN k END),
          ewah_bitmap(CASE WHEN k >= 150 THEN k END))) AS uni
      FROM bm_src""").collect().head
    assert(r.getLong(0) == 200L)
    assert(r.getBoolean(1), "no negatives -> empty bitmap")
    assert(r.getLong(2) == 20L, "intersection [100,120)")
    assert(r.getLong(3) == 100L, "union [0,50) + [150,200)")
  }

  test("ewah_bitmap buffers compress: sparse giant-key group stays tiny") {
    import spark.implicits._
    // keys {0, 10^9, Int.MaxValue} — the uncompressed word-aligned form
    // (java.util.BitSet, pre-round-5) would allocate max_key/8 ≈ 256 MB;
    // the chunked container must keep both the serialized bitmap and
    // the aggregation buffer within a few dozen bytes
    val r = spark.sql("""
      SELECT ewah_bitmap(k) AS bm, bitmap_count(ewah_bitmap(k)) AS ndv
      FROM VALUES (0L), (1000000000L), (2147483647L), (1000000000L) t(k)
      """).collect().head
    val bytes = r.getAs[Array[Byte]]("bm")
    assert(bytes.length < 64,
      s"sparse 3-key bitmap serialized to ${bytes.length} B — not compressed")
    assert(r.getLong(1) == 3L)
    // dense region still round-trips exactly, and the two forms compose
    val dense = spark.sql("""
      SELECT bitmap_count(ewah_bitmap_or(
        ewah_bitmap(k), ewah_bitmap(CASE WHEN k = 0 THEN 2147483647L END)))
      FROM (SELECT id AS k FROM range(0, 10000))""").collect().head
    assert(dense.getLong(0) == 10001L)
  }

  test("graft bitmap containers: array<->bitmap promotion and ops agree") {
    import graft.functions.GraftBitmap
    val a = new GraftBitmap()
    val b = new GraftBitmap()
    // a: evens in [0, 10000) (promotes to bitmap container) + one far key
    (0 until 10000 by 2).foreach(a.set)
    a.set(1 << 30)
    // b: multiples of 3 in [0, 10000) (array then bitmap) + same far key
    (0 until 10000 by 3).foreach(b.set)
    b.set(1 << 30)
    val aSer = GraftBitmap.valueOf(a.serialize())
    assert(aSer.cardinality == a.cardinality, "serialize round-trip")
    val expectInter = (0 until 10000).count(k => k % 2 == 0 && k % 3 == 0) + 1
    val inter = GraftBitmap.valueOf(a.serialize())
    inter.and(b)
    assert(inter.cardinality == expectInter)
    val expectUnion = (0 until 10000).count(k => k % 2 == 0 || k % 3 == 0) + 1
    val union = GraftBitmap.valueOf(a.serialize())
    union.or(b)
    assert(union.cardinality == expectUnion)
  }

  test("mask functions stay codegen-compatible (no UDF in plan)") {
    val plan = spark.sql("SELECT mask_first_n(c, 2) FROM VALUES ('AbC1') t(c)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
