package graft

import org.apache.spark.sql.functions._

import Queries._

/** Round-7 queries: the streaming SCD2 maintenance path proven against
  * the full-log oracle on real data (the q228 incremental theorem,
  * through Structured Streaming), and the multi-insert front door.
  */
object Round7Queries {

  /** The full-log SCD2 rebuild oracle — identical to q224/q228: the
    * maintained streaming table must equal a from-scratch build over
    * everything ingested. */
  private val Scd2Oracle = """
      WITH v AS (
        SELECT user_id, event_type, ts,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      ver AS (
        SELECT user_id, event_type, ts AS valid_from
        FROM v WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, valid_from,
        lead(valid_from) OVER (PARTITION BY user_id
          ORDER BY valid_from) AS valid_to,
        (lead(valid_from) OVER (PARTITION BY user_id
          ORDER BY valid_from) IS NULL) AS is_current
      FROM ver
      ORDER BY user_id, valid_from"""

  def all: Seq[Q] = Seq(

    // -- streaming SCD2 maintenance end-to-end: the events log arrives
    //    as three time-ordered file batches through a real Structured
    //    Streaming source (separate AvailableNow runs over one
    //    checkpoint — the restart path, not a simulated loop); each
    //    batch folds into the stored history via scdType2Apply inside
    //    the sink. Oracle = the full-log rebuild, so hash equality IS
    //    the "streaming maintenance ≡ batch build" theorem on real data.
    dfQ("q232_scd2_streaming", Scd2Oracle) { (s, d) =>
      import graft.streaming.Ingest
      val events = Tables.load(s, d, "events")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q232").toString
      val streamDir = s"$tmp/in"
      val table = "q232_scd2_stream"
      s.sql(s"DROP TABLE IF EXISTS $table")
      // a previous JVM may have left the managed location behind while
      // this catalog is fresh — saveAsTable would refuse the orphan dir
      val loc = new java.io.File(
        new java.io.File(java.net.URI.create(
          s.conf.get("spark.sql.warehouse.dir")).getPath), table)
      if (loc.exists())
        new scala.reflect.io.Directory(loc).deleteRecursively()
      val ep = Ingest.Endpoint(table, s"$tmp/ckpt")
      val cuts = Seq(
        ("1900-01-01", "2024-01-11"),
        ("2024-01-11", "2024-01-21"),
        ("2024-01-21", "2100-01-01"))
      cuts.foreach { case (lo, hi) =>
        events.filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") < lit(hi).cast("timestamp"))
          .write.mode("append").parquet(streamDir)
        Ingest.startScd2Maintenance(
          s.readStream.schema(events.schema).parquet(streamDir),
          ep, Seq("user_id"), Seq("ts", "event_id"), Seq("event_type"))
          .awaitTermination()
      }
      s.table(table).drop("_batch_id")
        .orderBy("user_id", "valid_from")
    },

    // -- single-statement multi-insert (FROM t INSERT … INSERT …)
    //    through the SQL front door: one cached source scan, two table
    //    sinks (WarehouseSpec proves the one-materialization property;
    //    this row proves the VALUES land right on real data). Oracle
    //    replays both sinks as CTEs over the same scan.
    dfQ("q233_multi_insert", """
      WITH a AS (
        SELECT o_orderpriority AS k, count(*) AS n FROM orders
        WHERE o_totalprice > 150000 GROUP BY o_orderpriority),
      b AS (
        SELECT o_orderstatus AS k, count(*) AS n FROM orders
        GROUP BY o_orderstatus)
      SELECT 'pri' AS side, k, n FROM a
      UNION ALL SELECT 'st' AS side, k, n FROM b
      ORDER BY side, k""") { (s, d) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-q233").toString
      s.sql("DROP TABLE IF EXISTS q233_a")
      s.sql("DROP TABLE IF EXISTS q233_b")
      s.sql(s"CREATE TABLE q233_a (k STRING, n BIGINT) USING parquet " +
        s"LOCATION '$tmp/a'")
      s.sql(s"CREATE TABLE q233_b (k STRING, n BIGINT) USING parquet " +
        s"LOCATION '$tmp/b'")
      GraftSession.sql(s,
        """FROM orders
          |INSERT OVERWRITE TABLE q233_a
          |  SELECT o_orderpriority, count(*)
          |  WHERE o_totalprice > 150000 GROUP BY o_orderpriority
          |INSERT OVERWRITE TABLE q233_b
          |  SELECT o_orderstatus, count(*) GROUP BY o_orderstatus""".stripMargin)
      s.table("q233_a").selectExpr("'pri' AS side", "k", "n")
        .unionByName(s.table("q233_b").selectExpr("'st' AS side", "k", "n"))
        .orderBy("side", "k")
    })
}
