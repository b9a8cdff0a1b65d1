package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Scan/source/sink parity (SURVEY §2.2): round-trips through every format
  * the environment provides (parquet, ORC, CSV, JSON, delimited text, and
  * Avro container files via graft.sources.Avro on the bundled avro core —
  * spark-avro is not in /opt/spark/jars), the RegexSerDe equivalent, and
  * schema-on-read semantics. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private lazy val nation = Tables.load(spark, dir, "nation")

  test("ORC round-trip with predicate pushdown (OrcInputFormat / SearchArgument)") {
    val out = tmp("orc") + "/nation"
    nation.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    val plan = back.filter($"n_nationkey" > 20).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,20)]"),
      s"ORC PPD missing:\n$plan")
  }

  test("CSV round-trip with header + explicit schema (OpenCSVSerde)") {
    val out = tmp("csv") + "/nation"
    nation.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("delimited text with custom delimiter (LazySimpleSerDe default tables)") {
    val out = tmp("tsv") + "/nation"
    nation.write.option("delimiter", "").csv(out)  // Hive's ^A default
    val back = spark.read.option("delimiter", "")
      .schema(nation.schema).csv(out)
    assert(back.count() == nation.count())
    assert(back.filter($"n_name" === "CHINA").count() ==
      nation.filter($"n_name" === "CHINA").count())
  }

  test("JSON round-trip + schema-on-read with missing fields as null") {
    val out = tmp("json") + "/nation"
    nation.write.json(out)
    val widened = spark.read
      .schema(nation.schema.add("extra_col", StringType)).json(out)
    assert(widened.count() == nation.count())
    assert(widened.filter($"extra_col".isNotNull).count() == 0,
      "schema-on-read: missing fields read as NULL (Hive semantics)")
  }

  test("get_json_object / from_json over raw JSON strings (JsonSerDe)") {
    val raw = Seq("""{"k": 1, "tags": ["a","b"]}""", """{"k": 2}""").toDS()
    val parsed = spark.read.json(raw)
    assert(parsed.agg(sum($"k")).collect().head.getLong(0) == 3L)
    val viaScalar = raw.toDF("j")
      .select(get_json_object($"j", "$.k").cast("long").as("k"))
      .agg(sum($"k")).collect().head.getLong(0)
    assert(viaScalar == 3L)
  }

  test("JSON corrupt rows: PERMISSIVE captures them, FAILFAST rejects (serde error tolerance)") {
    // Hive's JsonSerDe raises/ignores malformed rows per
    // ignore.malformed.json; the Spark-first equivalents are PERMISSIVE
    // mode with a corrupt-record column (row preserved for triage) and
    // FAILFAST (hard error)
    val out = tmp("jsonbad")
    java.nio.file.Files.write(java.nio.file.Paths.get(out, "part-0.json"),
      java.util.Arrays.asList(
        """{"k": 1, "v": "good"}""",
        """{"k": not valid json at all""",
        """{"k": 3, "v": "also good"}"""))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out).cache()
    try {
      assert(permissive.count() == 3)
      assert(permissive.filter($"_corrupt_record".isNotNull).count() == 1)
      assert(permissive.filter($"_corrupt_record".isNull)
        .agg(sum($"k")).collect().head.getLong(0) == 4L)
      val failfast = intercept[org.apache.spark.SparkException] {
        spark.read.schema(StructType(schema.dropRight(1)))
          .option("mode", "FAILFAST").json(out).collect()
      }
      assert(failfast.getMessage.contains("FAILFAST") ||
        failfast.getCause != null)
    } finally { permissive.unpersist(); () }
  }

  test("RegexSerDe equivalent: regexp_extract over text lines") {
    val out = tmp("rx")
    Seq("2024-01-01 ERROR something bad", "2024-01-02 INFO all good")
      .toDF("line").write.text(out + "/logs")
    val parsed = spark.read.text(out + "/logs")
      .select(
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 1).as("d"),
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 2).as("level"),
        regexp_extract($"value", "^(\\S+) (\\S+) (.*)$", 3).as("msg"))
    val rows = parsed.orderBy("d").collect()
    assert(rows(0).getString(1) == "ERROR" && rows(1).getString(1) == "INFO")
  }

  test("partitioned parquet write + read reconstructs partition column") {
    val out = tmp("pq") + "/orders"
    val orders = Tables.load(spark, dir, "orders")
      .withColumn("yr", year($"o_orderdate"))
    orders.write.partitionBy("yr").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.select(countDistinct($"yr")).collect().head.getLong(0) ==
      orders.select(countDistinct($"yr")).collect().head.getLong(0))
    assert(back.count() == orders.count())
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    val out = tmp("evolve") + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$out/gen=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$out/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "v1", "v2"))
    val rows = merged.select("id", "v1", "v2").orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a" &&
      rows(0).isNullAt(2), "old-generation rows read NULL for new columns")
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) &&
      rows(1).getDouble(2) == 3.5)
  }

  test("virtual column INPUT__FILE__NAME ≡ input_file_name() tracks source files") {
    // reference: TableScanOperator vcols (exec/TableScanOperator.java:1)
    val out = tmp("vcol") + "/nation"
    Tables.load(spark, dir, "nation")
      .withColumn("half", ($"n_nationkey" % 2).cast("int"))
      .write.partitionBy("half").parquet(out)
    val back = spark.read.parquet(out)
      .select($"n_nationkey", $"half", input_file_name().as("fname"))
      .collect()
    assert(back.map(_.getString(2)).distinct.length >= 2,
      "partitioned layout must yield multiple source files")
    // every row's file path lies inside its own partition directory
    back.foreach(r =>
      assert(r.getString(2).contains(s"half=${r.getInt(1)}"),
        s"row ${r.getInt(0)}: file ${r.getString(2)} vs half=${r.getInt(1)}"))
  }

  test("Avro container round-trip incl. nulls, bytes, arrays (AvroSerDe)") {
    val out = tmp("avro") + "/mixed"
    val df = Seq(
      (1, Some("alpha"), Some(1.5), Array[Byte](1, 2, 3), Seq(1L, 2L)),
      (2, None, None, Array[Byte](), Seq.empty[Long]),
      (3, Some("gamma"), Some(-0.25), Array[Byte](-1), Seq(42L))
    ).toDF("id", "name", "score", "payload", "keys")
    graft.sources.Avro.write(df, out)
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".avro")))
    val back = graft.sources.Avro.read(spark, out)
    assert(back.schema("name").nullable && back.schema("score").nullable)
    val got = back.orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getString(1) == "alpha" && got(1).isNullAt(1))
    assert(got(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
    assert(got(0).getAs[scala.collection.Seq[Long]]("keys").toSeq == Seq(1L, 2L))
    assert(got(2).getDouble(2) == -0.25)
  }

  test("Avro read of a TPC-H table matches the parquet original") {
    val out = tmp("avro") + "/nation"
    // nation: int keys + strings — write via our sink, read via our source
    graft.sources.Avro.write(nation, out)
    val back = graft.sources.Avro.read(spark, out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("UNIONTYPE (create_union) survives write→read and tag branching") {
    // ref: FunctionRegistry.java:405, HiveParser.g:2128 — the struct+tag
    // encoding must round-trip through the warehouse and branch on tag
    Tables.register(spark, dir)
    val t = "src_union_rt"
    Warehouse.dropTable(spark, t)
    val df = spark.sql("""
      SELECT o_orderkey,
        create_union(if(o_totalprice > 100000, 0, 1),
                     o_orderstatus, o_totalprice) AS u
      FROM orders WHERE o_orderkey < 100""")
    Warehouse.createTable(df, t)
    val back = spark.table(t)
    val uType = back.schema("u").dataType.asInstanceOf[StructType]
    assert(uType.fieldNames.toSeq == Seq("tag", "field0", "field1"))
    // both branches present, and the active branch reconstructs the source
    val tags = back.select("u.tag").distinct().collect().map(_.getInt(0)).sorted
    assert(tags.toSeq == Seq(0, 1))
    val rebuilt = back.selectExpr("o_orderkey",
      "CASE WHEN u.tag = 0 THEN u.field0 ELSE cast(u.field1 AS string) END AS v")
    val expected = spark.sql("""
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 100000 THEN o_orderstatus
             ELSE cast(o_totalprice AS string) END AS v
      FROM orders WHERE o_orderkey < 100""")
    assert(rebuilt.orderBy("o_orderkey").collect().toSeq ==
      expected.orderBy("o_orderkey").collect().toSeq)
    Warehouse.dropTable(spark, t)
  }

  test("SequenceFile round-trip with ^A-delimited rows and \\N nulls") {
    // STORED AS SEQUENCEFILE: Text,Text container + LazySimpleSerDe rows
    val out = tmp("seq") + "/nation"
    graft.sources.SequenceFiles.writeDelimited(nation, out)
    val back = graft.sources.SequenceFiles.readDelimited(
      spark, out, nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // nulls round-trip as \N
    val out2 = tmp("seq") + "/nulls"
    val df = Seq((1, Some("a")), (2, None)).toDF("id", "v")
    graft.sources.SequenceFiles.writeDelimited(df, out2)
    val got = graft.sources.SequenceFiles.readDelimited(spark, out2, df.schema)
      .orderBy("id").collect()
    assert(got(0).getString(1) == "a" && got(1).isNullAt(1))
    // values are unquoted: a leading double-quote must round-trip verbatim
    val out3 = tmp("seq") + "/quotes"
    val dq = Seq((1, "\"quoted start"), (2, "mid\"dle")).toDF("id", "v")
    graft.sources.SequenceFiles.writeDelimited(dq, out3)
    val backq = graft.sources.SequenceFiles.readDelimited(spark, out3, dq.schema)
      .orderBy("id").collect()
    assert(backq(0).getString(1) == "\"quoted start")
    assert(backq(1).getString(1) == "mid\"dle")
    // the files really are Hadoop SequenceFiles (magic bytes "SEQ")
    val part = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val magic = java.nio.file.Files.readAllBytes(part.toPath).take(3)
    assert(new String(magic, "US-ASCII") == "SEQ")
  }

  test("compressed write (snappy parquet / zlib orc) stays readable") {
    val o1 = tmp("comp") + "/p"
    nation.write.option("compression", "snappy").parquet(o1)
    assert(spark.read.parquet(o1).count() == 25)
    val o2 = tmp("comp") + "/o"
    nation.write.option("compression", "zlib").orc(o2)
    assert(spark.read.orc(o2).count() == 25)
  }

  // ---- RCFile fixture builder: writes the byte layout from the
  //      normative BNF in ql/io/RCFile.java's javadoc, independently of
  //      the reader under test ----

  private def writeHadoopVLong(o: java.io.DataOutput, v: Long): Unit =
    if (v >= -112 && v <= 127) o.writeByte(v.toInt)
    else {
      var len = -112
      var value = v
      if (value < 0) { value = ~value; len = -120 }
      var tmp2 = value
      while (tmp2 != 0) { tmp2 >>>= 8; len -= 1 }
      o.writeByte(len)
      val n = if (len < -120) -(len + 120) else -(len + 112)
      var idx = n - 1
      while (idx >= 0) {
        o.writeByte(((value >> (8 * idx)) & 0xff).toInt)
        idx -= 1
      }
    }

  private def writeText(o: java.io.DataOutput, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeHadoopVLong(o, b.length)
    o.write(b)
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build one RCFile: `groups` of rows, each row a seq of nullable
    * strings; a sync marker is interleaved before every group after the
    * first (the layout a multi-group writer produces). */
  private def rcFixture(
      groups: Seq[Seq[Seq[Option[String]]]], compressed: Boolean): Array[Byte] = {
    val nCols = groups.head.head.size
    val sync = Array.tabulate[Byte](16)(i => (0x40 + i).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.write(Array[Byte]('R', 'C', 'F', 1))
    o.writeBoolean(compressed)
    if (compressed)
      writeText(o, "org.apache.hadoop.io.compress.DefaultCodec")
    o.writeInt(1) // metadata pairs
    writeText(o, "hive.io.rcfile.column.number")
    writeText(o, nCols.toString)
    o.write(sync)
    groups.zipWithIndex.foreach { case (rows, gi) =>
      if (gi > 0) { o.writeInt(-1); o.write(sync) } // interleaved sync
      val numRows = rows.size
      // per-column plain buffers + field lengths
      val colBytes = (0 until nCols).map { c =>
        val cells = rows.map(r =>
          r(c).getOrElse(graft.sources.RcFiles.NullSequence).getBytes("UTF-8"))
        (cells.reduce(_ ++ _), cells.map(_.length))
      }
      val valueParts = colBytes.map { case (plain, _) =>
        if (compressed) deflate(plain) else plain
      }
      // key section: numRows, then per column (diskLen, plainLen,
      // keyBufLen, RLE'd field lengths)
      val keyBos = new java.io.ByteArrayOutputStream()
      val k = new java.io.DataOutputStream(keyBos)
      writeHadoopVLong(k, numRows)
      colBytes.zip(valueParts).foreach { case ((plain, lens), disk) =>
        writeHadoopVLong(k, disk.length)
        writeHadoopVLong(k, plain.length)
        val rleBos = new java.io.ByteArrayOutputStream()
        val rle = new java.io.DataOutputStream(rleBos)
        var i = 0
        while (i < lens.size) {
          var run = 0
          while (i + run + 1 < lens.size && lens(i + run + 1) == lens(i))
            run += 1
          writeHadoopVLong(rle, lens(i))
          if (run > 0) writeHadoopVLong(rle, ~run) // 1,1,1 ⇒ 1,~2
          i += run + 1
        }
        writeHadoopVLong(k, rleBos.size())
        rleBos.writeTo(k)
      }
      val keyPlain = keyBos.toByteArray
      val keyDisk = if (compressed) deflate(keyPlain) else keyPlain
      o.writeInt(keyDisk.length + valueParts.map(_.length).sum) // record len
      o.writeInt(keyPlain.length)   // key length (uncompressed)
      o.writeInt(keyDisk.length)    // compressed key length
      o.write(keyDisk)
      valueParts.foreach(o.write)
    }
    bos.toByteArray
  }

  private val rcSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType)))

  private val rcGroups: Seq[Seq[Seq[Option[String]]]] = Seq(
    Seq(Seq(Some("1"), Some("alpha"), Some("1.5")),
      Seq(Some("2"), None, Some("2.5")),
      Seq(Some("3"), Some("gamma"), Some("3.5"))),
    Seq(Seq(Some("4"), Some("delta"), Some("4.5"))))

  test("RCFile reader: plain fixture with sync marker, RLE lengths, nulls") {
    val dir = new java.io.File(tmp("rcf"))
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000.rc").toPath,
      rcFixture(rcGroups, compressed = false))
    val got = graft.sources.RcFiles.read(spark, dir.toString, rcSchema)
      .orderBy("id").collect()
    assert(got.length == 4)
    assert(got(0).getInt(0) == 1 && got(0).getString(1) == "alpha" &&
      got(0).getDouble(2) == 1.5)
    assert(got(1).isNullAt(1), "\\N must decode to NULL")
    assert(got(3).getInt(0) == 4 && got(3).getString(1) == "delta" &&
      got(3).getDouble(2) == 4.5)
  }

  test("RCFile reader: DefaultCodec (zlib) compressed key and columns") {
    val dir = new java.io.File(tmp("rcfz"))
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000.rc").toPath,
      rcFixture(rcGroups, compressed = true))
    val got = graft.sources.RcFiles.read(spark, dir.toString, rcSchema)
      .orderBy("id").collect()
    assert(got.length == 4)
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(got(2).getString(1) == "gamma" && got(2).getDouble(2) == 3.5)
  }

  test("RCFile reader: legacy SEQ6 header and bad magic fail loudly") {
    val dir = new java.io.File(tmp("rcfbad"))
    java.nio.file.Files.write(new java.io.File(dir, "seq.rc").toPath,
      Array[Byte]('S', 'E', 'Q', 6) ++ Array.fill[Byte](40)(0))
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.RcFiles.read(spark, dir.toString, rcSchema).collect()
    }
    assert(e.getMessage.contains("SEQ6") ||
      Option(e.getCause).exists(_.getMessage.contains("SEQ6")))
  }
}
