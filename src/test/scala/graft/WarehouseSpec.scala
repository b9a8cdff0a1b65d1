package graft

import org.apache.spark.sql.functions._

/** Catalog/DDL/writer surface: partitioned + bucketed tables, dynamic
  * partition overwrite, multi-insert, UPDATE/DELETE rewrites, and the
  * bucketed-join shuffle elision that realizes Hive's SMB join. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.register(spark, dir)
  }

  test("partitioned table write creates partition layout + pruning works") {
    val t = "wh_orders_part"
    Warehouse.dropTable(spark, t)
    val df = Tables.load(spark, dir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    Warehouse.createTable(df, t, partitionBy = Seq("o_year"))
    assert(Warehouse.partitionColumns(spark, t) == Seq("o_year"))
    val plan = spark.table(t).filter($"o_year" === 1996)
      .queryExecution.executedPlan.toString
    // static partition pruning: only the matching partition is scanned
    assert(spark.table(t).filter($"o_year" === 1996).count() ==
      df.filter($"o_year" === 1996).count())
    assert(plan.contains("o_year=1996") || plan.contains("PartitionFilters"),
      s"expected partition pruning in:\n$plan")
  }

  test("dynamic INSERT OVERWRITE replaces only touched partitions") {
    val t = "wh_dyn_part"
    Warehouse.dropTable(spark, t)
    val df = Seq((1, "a", 2020), (2, "b", 2020), (3, "c", 2021))
      .toDF("id", "v", "yr")
    Warehouse.createTable(df, t, partitionBy = Seq("yr"))
    // overwrite only yr=2021 with one new row
    Warehouse.insertOverwriteDynamic(spark, t,
      Seq((9, "z", 2021)).toDF("id", "v", "yr"))
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(2))).toSeq
    assert(rows == Seq((1, 2020), (2, 2020), (9, 2021)),
      "2020 partition untouched, 2021 replaced")
  }

  test("bucketed co-partitioned join elides the shuffle (SMB join)") {
    val tl = "wh_li_bucket"; val to = "wh_ord_bucket"
    Warehouse.dropTable(spark, tl)
    Warehouse.dropTable(spark, to)
    Warehouse.createTable(Tables.load(spark, dir, "lineitem"), tl,
      bucketBy = Some((4, Seq("l_orderkey"))), sortBy = Seq("l_orderkey"))
    Warehouse.createTable(Tables.load(spark, dir, "orders"), to,
      bucketBy = Some((4, Seq("o_orderkey"))), sortBy = Seq("o_orderkey"))
    val joined = spark.table(tl).join(spark.table(to),
      $"l_orderkey" === $"o_orderkey")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == spark.table(tl).count())
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("multi-insert fans one source scan into N tables") {
    Warehouse.dropTable(spark, "wh_mi_big")
    Warehouse.dropTable(spark, "wh_mi_small")
    val src = Tables.load(spark, dir, "orders")
    Warehouse.createTable(src.filter(lit(false)), "wh_mi_big")
    Warehouse.createTable(src.filter(lit(false)), "wh_mi_small")
    Warehouse.multiInsert(src, Seq(
      "wh_mi_big" -> (df => df.filter($"o_totalprice" > 100000)),
      "wh_mi_small" -> (df => df.filter($"o_totalprice" <= 100000))))
    val big = spark.table("wh_mi_big").count()
    val small = spark.table("wh_mi_small").count()
    assert(big + small == src.count() && big > 0 && small > 0)
  }

  test("UPDATE rewrites matching rows, partition-granular on partitioned") {
    val t = "wh_upd"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, 10.0, 2020), (2, 20.0, 2020), (3, 30.0, 2021))
        .toDF("id", "amt", "yr"),
      t, partitionBy = Seq("yr"))
    Warehouse.update(spark, t,
      sets = Map("amt" -> "amt * 2"), where = "yr = 2020 AND id = 1")
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 20.0), (2, 20.0), (3, 30.0)))
  }

  test("MERGE INTO: update/delete/insert branches through the front door") {
    val t = "wh_merge"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0))
        .toDF("id", "s", "v"), t)
    Seq((1, 100.0), (3, -1.0), (9, 90.0))
      .toDF("id", "nv").createOrReplaceTempView("wh_merge_src")
    GraftSession.sql(spark,
      """MERGE INTO wh_merge t USING wh_merge_src s ON t.id = s.id
         WHEN MATCHED AND s.nv < 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.nv
         WHEN NOT MATCHED THEN INSERT VALUES (s.id, 'new', s.nv);""")
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq(
      (1, "a", 100.0),    // matched -> update
      (2, "b", 20.0),     // untouched
      (4, "d", 40.0),     // untouched
      (9, "new", 90.0)))  // not matched -> insert; id 3 deleted
  }

  test("MERGE INTO: unparenthesized CASE WHEN inside a clause body " +
    "does not split the statement") {
    val t = "wh_merge_case"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Seq((1, 10.0), (2, 20.0)).toDF("id", "v"), t)
    Seq((1, 5.0), (2, -3.0)).toDF("id", "nv")
      .createOrReplaceTempView("wh_mc_src")
    GraftSession.sql(spark,
      """MERGE INTO wh_merge_case t USING wh_mc_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET
           v = CASE WHEN s.nv > 0 THEN s.nv ELSE 0 END""")
    assert(spark.table(t).orderBy("id").collect()
      .map(_.getDouble(1)).toSeq == Seq(5.0, 0.0))
  }

  test("MERGE INTO: clause order wins and cardinality violations abort") {
    val t = "wh_merge2"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Seq((1, 10.0)).toDF("id", "v"), t)
    // update listed FIRST claims the row even though the delete's
    // condition also holds
    Seq((1, 0.0)).toDF("id", "nv").createOrReplaceTempView("wh_merge2_src")
    GraftSession.sql(spark,
      """MERGE INTO wh_merge2 t USING wh_merge2_src s ON t.id = s.id
         WHEN MATCHED AND s.nv = 0 THEN UPDATE SET v = -1
         WHEN MATCHED THEN DELETE""")
    assert(spark.table(t).collect().map(_.getDouble(1)).toSeq == Seq(-1.0))
    // two source rows for one target row -> Hive cardinality violation
    Seq((1, 1.0), (1, 2.0)).toDF("id", "nv")
      .createOrReplaceTempView("wh_merge2_dup")
    val e = intercept[IllegalArgumentException] {
      GraftSession.sql(spark,
        """MERGE INTO wh_merge2 t USING wh_merge2_dup s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("MERGE INTO partitioned target rewrites touched partitions and " +
    "drops emptied ones") {
    val t = "wh_merge_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, 10.0, 2020), (2, 20.0, 2020), (3, 30.0, 2021))
        .toDF("id", "v", "yr"), t, partitionBy = Seq("yr"))
    Seq((3, 0.0, 2022), (7, 70.0, 2022)).toDF("id", "nv", "nyr")
      .createOrReplaceTempView("wh_mp_src")
    GraftSession.sql(spark,
      """MERGE INTO wh_merge_part t USING wh_mp_src s ON t.id = s.id
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.nv, s.nyr)""")
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(2))).toSeq
    assert(rows == Seq((1, 2020), (2, 2020), (7, 2022)))
    // 2021 emptied by the delete -> partition gone, 2022 created
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.sorted.toSeq == Seq("yr=2020", "yr=2022"))
  }

  test("compact merges small files to the size target, partitioned " +
    "tables per-directory, preserving data") {
    val t = "wh_compact"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      (1 to 400).map(i => (i, s"row$i", 2020 + i % 2)).toDF("id", "v", "yr")
        .repartition(10),
      t, partitionBy = Seq("yr"))
    val loc = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location.getPath)
    def filesPerPart = loc.listFiles().filter(_.isDirectory).map(d =>
      d.getName -> d.listFiles().count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    ).toMap
    assert(filesPerPart.values.forall(_ > 1), "fixture needs small files")
    val before = spark.table(t).orderBy("id").collect().toSeq
    Warehouse.compact(spark, t) // 128MB target >> data -> 1 file each
    assert(filesPerPart.values.forall(_ == 1), s"got $filesPerPart")
    assert(spark.table(t).orderBy("id").collect().toSeq == before)

    val u = "wh_compact_flat"
    Warehouse.dropTable(spark, u)
    Warehouse.createTable(
      (1 to 100).map(i => (i, i * 2)).toDF("a", "b").repartition(8), u)
    Warehouse.compact(spark, u)
    val files = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(u)).location.getPath)
      .listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files == 1 && spark.table(u).count() == 100)
  }

  test("DELETE removes matching rows only") {
    val t = "wh_del"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "keep", 2020), (2, "drop", 2020), (3, "keep", 2021))
        .toDF("id", "v", "yr"),
      t, partitionBy = Seq("yr"))
    Warehouse.delete(spark, t, where = "v = 'drop'")
    assert(spark.table(t).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 3))
  }

  test("DELETE keeps rows whose predicate evaluates to NULL (3VL)") {
    // SQL DELETE removes only predicate-TRUE rows; NULL predicate keeps.
    val t = "wh_del_null"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, Some(5)), (2, None), (3, Some(50))).toDF("id", "amt"), t)
    Warehouse.delete(spark, t, where = "amt > 10")
    assert(spark.table(t).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 2), "NULL-amt row must survive the delete")
    // partitioned branch: NULL-predicate rows inside a touched partition
    val tp = "wh_del_null_part"
    Warehouse.dropTable(spark, tp)
    Warehouse.createTable(
      Seq((1, Some(5), 2020), (2, None, 2020), (3, Some(50), 2020),
        (4, None, 2021)).toDF("id", "amt", "yr"),
      tp, partitionBy = Seq("yr"))
    Warehouse.delete(spark, tp, where = "amt > 10")
    assert(spark.table(tp).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 2, 4), "NULL-amt rows survive in touched and untouched partitions")
  }

  test("DELETE that empties an entire partition removes it (not a no-op)") {
    // dynamic overwrite only rewrites partitions present in the written
    // data — a fully-deleted partition must be dropped explicitly
    val t = "wh_del_empty_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, 2020), (2, 2020), (3, 2021)).toDF("id", "yr"),
      t, partitionBy = Seq("yr"))
    Warehouse.delete(spark, t, where = "yr = 2020")
    assert(spark.table(t).collect().map(_.getInt(0)).toSeq == Seq(3),
      "all 2020 rows must actually be gone")
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
      .toSeq == Seq("yr=2021"), "emptied partition dropped from catalog")
  }

  test("DELETE works on date-partitioned tables incl. emptying a partition") {
    val t = "wh_del_date_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-02-01"))
        .toDF("id", "d_s")
        .select($"id", $"d_s".cast("date").as("d")),
      t, partitionBy = Seq("d"))
    Warehouse.delete(spark, t, where = "d = date'2024-01-01'")
    assert(spark.table(t).collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(spark.sql(s"SHOW PARTITIONS $t").count() == 1,
      "emptied DATE partition dropped (no SQL-literal rendering)")
  }

  test("DELETE and UPDATE reach rows in the NULL partition") {
    val t = "wh_null_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, Some("a")), (2, None), (3, None)).toDF("id", "p"),
      t, partitionBy = Seq("p"))
    // the predicate matches a row living in p=NULL
    Warehouse.delete(spark, t, where = "id = 2")
    assert(spark.table(t).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 3), "row in the NULL partition must actually be deleted")
    Warehouse.update(spark, t, Map("id" -> "30"), "id = 3")
    assert(spark.table(t).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 30), "row in the NULL partition must actually be updated")
  }

  test("dropTable keeps data of EXTERNAL tables (Hive semantics)") {
    val loc = java.nio.file.Files.createTempDirectory("wh-ext").toString
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(loc)
    val t = "wh_external"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id INT, v STRING) USING parquet LOCATION '$loc'")
    Warehouse.dropTable(spark, t)
    assert(!spark.catalog.tableExists(t))
    assert(spark.read.parquet(loc).count() == 1,
      "external data must survive the drop")
  }

  test("UPDATE rejects SET on a partition column (Hive semantics)") {
    val t = "wh_upd_partcol"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, 10.0, 2020)).toDF("id", "amt", "yr"), t, partitionBy = Seq("yr"))
    val e = intercept[IllegalArgumentException] {
      Warehouse.update(spark, t, Map("yr" -> "2021"), "id = 1")
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("dropTable removes the real location for qualified db.table names") {
    spark.sql("CREATE DATABASE IF NOT EXISTS whdb")
    val t = "whdb.wh_qual"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Seq((1, "a")).toDF("id", "v"), t)
    val loc = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location.getPath)
    assert(loc.exists(), "table files written")
    Warehouse.dropTable(spark, t)
    assert(!loc.exists(), s"location $loc must be removed on drop")
    // re-create must not hit LOCATION_ALREADY_EXISTS
    Warehouse.createTable(Seq((2, "b")).toDF("id", "v"), t)
    assert(spark.table(t).count() == 1)
    Warehouse.dropTable(spark, t)
    spark.sql("DROP DATABASE IF EXISTS whdb")
  }

  test("UPDATE on unpartitioned table works via staged rewrite") {
    val t = "wh_upd_flat"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    Warehouse.update(spark, t, Map("v" -> "'z'"), "id = 2")
    assert(spark.table(t).orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "z"))
  }

  test("ANALYZE feeds row-count statistics to the catalog") {
    val t = "wh_stats"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Tables.load(spark, dir, "nation"), t)
    Warehouse.analyze(spark, t)
    val stats = spark.sql(s"DESCRIBE EXTENDED $t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(stats.get("Statistics").exists(_.contains("25 rows")),
      s"expected row stats, got ${stats.get("Statistics")}")
  }

  test("SHOW PARTITIONS + ALTER TABLE ADD/DROP PARTITION (DDL family)") {
    val t = "wh_part_ddl"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "a", 2020), (2, "b", 2021), (3, "c", 2022)).toDF("id", "v", "yr"),
      t, partitionBy = Seq("yr"))
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.sorted.toSeq == Seq("yr=2020", "yr=2021", "yr=2022"))
    spark.sql(s"ALTER TABLE $t DROP PARTITION (yr=2021)")
    assert(spark.sql(s"SHOW PARTITIONS $t").count() == 2)
    assert(spark.table(t).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 3), "dropped partition's rows are gone")
    spark.sql(s"ALTER TABLE $t ADD PARTITION (yr=2030)")
    assert(spark.sql(s"SHOW PARTITIONS $t").count() == 3)
    Warehouse.dropTable(spark, t)
  }

  test("SHOW/DESCRIBE surface works through spark.sql") {
    assert(spark.sql("SHOW TABLES").count() > 0)
    assert(spark.sql("DESCRIBE TABLE lineitem").count() >= 11)
  }

  test("MSCK REPAIR TABLE discovers partitions dropped into the location") {
    // Hive's metastore-check DDL (DDLTask msck): files landed out-of-band
    // under partition directories become visible after repair
    val t = "wh_msck"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "a", 2020)).toDF("id", "v", "yr"), t, partitionBy = Seq("yr"))
    val loc = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t)).location.getPath)
    // land a new partition's files directly on storage
    Seq((9, "z", 2030)).toDF("id", "v", "yr")
      .write.partitionBy("yr").mode("append").parquet(loc.getPath + "_stage")
    val staged = new java.io.File(loc.getPath + "_stage/yr=2030")
    java.nio.file.Files.move(staged.toPath,
      new java.io.File(loc, "yr=2030").toPath)
    assert(spark.sql(s"SHOW PARTITIONS $t").count() == 1, "not yet visible")
    spark.sql(s"MSCK REPAIR TABLE $t")
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).sorted
      .toSeq == Seq("yr=2020", "yr=2030"))
    assert(spark.table(t).count() == 2, "repaired partition's rows readable")
    Warehouse.dropTable(spark, t)
  }

  test("SHOW CREATE TABLE round-trips a partitioned table definition") {
    val t = "wh_showcreate"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, "a", 2020)).toDF("id", "v", "yr"), t, partitionBy = Seq("yr"))
    val ddl = spark.sql(s"SHOW CREATE TABLE $t").collect().head.getString(0)
    assert(ddl.contains("PARTITIONED BY") && ddl.toLowerCase.contains("parquet"))
    // the emitted DDL re-creates an equivalent (empty) table
    val t2 = "wh_showcreate2"
    Warehouse.dropTable(spark, t2)
    spark.sql(ddl.replaceFirst(s"(?i)TABLE .*?$t", s"TABLE $t2"))
    assert(spark.table(t2).schema == spark.table(t).schema)
    assert(Warehouse.partitionColumns(spark, t2) == Seq("yr"))
    Warehouse.dropTable(spark, t)
    Warehouse.dropTable(spark, t2)
  }

  test("LOAD DATA moves files into the table; OVERWRITE replaces them") {
    val t = "wh_load"
    Warehouse.dropTable(spark, t)
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Warehouse.createTable(base, t)
    // stage two more rows as parquet files outside the warehouse
    val stage = java.nio.file.Files.createTempDirectory("load").toString + "/in"
    Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      .coalesce(1).write.parquet(stage)
    Warehouse.loadData(spark, stage, t)
    assert(spark.table(t).count() == 4)
    // the staged files were MOVED, not copied (MoveTask semantics)
    assert(!new java.io.File(stage).listFiles()
      .exists(_.getName.endsWith(".parquet")))
    val stage2 = java.nio.file.Files.createTempDirectory("load2").toString + "/in"
    Seq((9L, "z")).toDF("id", "v").coalesce(1).write.parquet(stage2)
    Warehouse.loadData(spark, stage2, t, overwrite = true)
    val rows = spark.table(t).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 9L)
    Warehouse.dropTable(spark, t)
  }

  test("LOAD DATA into a PARTITION registers it and values come from the dir") {
    val t = "wh_load_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(Seq((1L, "a", 2020)).toDF("id", "v", "yr"),
      t, partitionBy = Seq("yr"))
    // partition files must NOT contain the partition column
    val stage = java.nio.file.Files.createTempDirectory("loadp").toString + "/in"
    Seq((5L, "e"), (6L, "f")).toDF("id", "v").coalesce(1).write.parquet(stage)
    Warehouse.loadData(spark, stage, t, partition = Seq("yr" -> "2021"))
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0))
    assert(parts.contains("yr=2021"), parts.mkString(","))
    assert(spark.table(t).filter($"yr" === 2021).count() == 2)
    assert(spark.table(t).count() == 3)
    Warehouse.dropTable(spark, t)
  }

  test("EXPORT TABLE / IMPORT TABLE round-trips data, partitions and schema") {
    val t = "wh_export_src"
    val t2 = "wh_import_dst"
    Warehouse.dropTable(spark, t)
    Warehouse.dropTable(spark, t2)
    val df = Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021))
      .toDF("id", "v", "yr")
    Warehouse.createTable(df, t, partitionBy = Seq("yr"))
    val exp = java.nio.file.Files.createTempDirectory("exp").toString + "/t"
    Warehouse.exportTable(spark, t, exp)
    assert(new java.io.File(exp, "_metadata").exists())
    Warehouse.importTable(spark, t2, exp)
    assert(spark.table(t2).schema == spark.table(t).schema)
    assert(Warehouse.partitionColumns(spark, t2) == Seq("yr"))
    assert(spark.table(t2).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
    // partitions registered, pruning-visible
    val parts = spark.sql(s"SHOW PARTITIONS $t2").collect().map(_.getString(0))
    assert(parts.toSet == Set("yr=2020", "yr=2021"))
    Warehouse.dropTable(spark, t)
    Warehouse.dropTable(spark, t2)
  }

  test("UPDATE SET assignments are simultaneous (see pre-update values)") {
    val t = "wh_upd_sim"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("id", "a", "b"), t)
    // a swap must not see the already-updated a; and the predicate must
    // not re-evaluate against updated columns
    Warehouse.update(spark, t,
      sets = Map("a" -> "b", "b" -> "a"), where = "a <= 10")
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1, 100.0, 10.0), (2, 20.0, 200.0)))
    // unknown SET column is rejected, not silently dropped
    intercept[IllegalArgumentException] {
      Warehouse.update(spark, t, Map("nope" -> "1"), "true")
    }
    Warehouse.dropTable(spark, t)
  }

  test("LOAD DATA PARTITION spec is order-normalized and pre-validated") {
    val t = "wh_load_spec"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Seq((1L, "a", 2020, 1)).toDF("id", "v", "yr", "mo"),
      t, partitionBy = Seq("yr", "mo"))
    // spec in the WRONG key order must land in the canonical yr=/mo= dir
    val stage = java.nio.file.Files.createTempDirectory("loadspec")
      .toString + "/in"
    Seq((7L, "g")).toDF("id", "v").coalesce(1).write.parquet(stage)
    Warehouse.loadData(spark, stage, t,
      partition = Seq("mo" -> "2", "yr" -> "2021"))
    assert(spark.table(t).filter($"yr" === 2021 && $"mo" === 2).count() == 1)
    // misspelled / incomplete specs are rejected BEFORE any file move
    val stage2 = java.nio.file.Files.createTempDirectory("loadspec2")
      .toString + "/in"
    Seq((8L, "h")).toDF("id", "v").coalesce(1).write.parquet(stage2)
    intercept[IllegalArgumentException] {
      Warehouse.loadData(spark, stage2, t,
        partition = Seq("year" -> "2022", "mo" -> "3"))
    }
    intercept[IllegalArgumentException] {
      Warehouse.loadData(spark, stage2, t, partition = Seq("yr" -> "2022"))
    }
    // the source files survived the failed loads
    assert(new java.io.File(stage2).listFiles()
      .exists(_.getName.endsWith(".parquet")))
    Warehouse.dropTable(spark, t)
  }

  test("SQL front door: FROM t INSERT ... INSERT ... writes every sink " +
    "from ONE source materialization") {
    import org.apache.spark.util.LongAccumulator
    val acc: LongAccumulator =
      spark.sparkContext.longAccumulator("q233_src_scans")
    // a source whose materialization is observable: every partition
    // computed bumps the accumulator
    val src = spark.range(0, 100, 1, 4).as[Long].mapPartitions { it =>
      acc.add(1); it
    }.toDF("id")
    src.createOrReplaceTempView("mi_src")
    val loc = java.nio.file.Files.createTempDirectory("graft-mi").toString
    spark.sql(s"CREATE TABLE mi_a (id BIGINT) USING parquet LOCATION '$loc/a'")
    spark.sql(
      s"CREATE TABLE mi_b (id BIGINT, two BIGINT) USING parquet LOCATION '$loc/b'")
    try {
      GraftSession.sql(spark,
        """FROM mi_src
          |INSERT OVERWRITE TABLE mi_a SELECT id WHERE id < 10
          |INSERT INTO TABLE mi_b SELECT id, id * 2 WHERE id >= 95""".stripMargin)
      assert(spark.table("mi_a").as[Long].collect().sorted.toSeq ==
        (0L until 10L))
      assert(spark.table("mi_b").select("two").as[Long].collect().sorted
        .toSeq == Seq(190L, 192L, 194L, 196L, 198L))
      // ONE materialization: 4 partitions computed exactly once
      assert(acc.value == 4L,
        s"source computed ${acc.value} partition-times, expected 4 (one scan)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mi_a")
      spark.sql("DROP TABLE IF EXISTS mi_b")
      spark.catalog.dropTempView("mi_src")
    }
  }

  test("SQL front door: multi-insert with aliased subquery source and " +
    "static partition sinks") {
    val loc = java.nio.file.Files.createTempDirectory("graft-mi2").toString
    spark.sql("DROP TABLE IF EXISTS mi_p")
    spark.sql(s"CREATE TABLE mi_p (k STRING, n BIGINT) USING parquet " +
      s"PARTITIONED BY (ds STRING) LOCATION '$loc/p'")
    try {
      GraftSession.sql(spark,
        """FROM (SELECT o_orderpriority p, o_orderkey k FROM orders) o
          |INSERT OVERWRITE TABLE mi_p PARTITION (ds='d1')
          |  SELECT p, count(*) GROUP BY p
          |INSERT INTO TABLE mi_p PARTITION (ds='d2')
          |  SELECT p, count(*) WHERE k % 2 = 0 GROUP BY p""".stripMargin)
      val d1 = spark.table("mi_p").where($"ds" === "d1")
      val d2 = spark.table("mi_p").where($"ds" === "d2")
      val oracle1 = spark.table("orders").groupBy("o_orderpriority").count()
      assert(d1.count() == oracle1.count() && d1.count() > 0)
      assert(d2.count() > 0 &&
        d2.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() ==
          spark.table("orders").where($"o_orderkey" % 2 === 0).count())
    } finally spark.sql("DROP TABLE IF EXISTS mi_p")
  }
}
