package graft

import Queries._

/** Window/PTF + grouping-sets parity.
  *
  * Reference: PTFOperator + WindowingTableFunction (ql/udf/ptf/
  * WindowingTableFunction.java:66) buffer a partition and evaluate window
  * functions over ROWS/RANGE frames (parse/WindowingSpec.java:536-540);
  * grouping sets are planned by row replication with a grouping-set id key
  * (parse/SemanticAnalyzer.java:3452-3487). Spark's WindowExec + Expand
  * cover both natively; frames map 1:1.
  *
  * Determinism: every ORDER BY inside OVER ends in a unique key so
  * row_number/lead/lag/ntile are well-defined; window sums go through the
  * exact-decimal strategy.
  */
object WindowQueries {

  private def dsum(e: String) = s"cast(sum(cast($e as decimal(18,2))) as double)"

  def all: Seq[Q] = Seq(
    // -- ROLLUP with grouping() flags (GROUPING__ID equivalent)
    dual("q20_rollup", """
      SELECT r_name, n_name, count(*) AS n_nations,
        grouping(r_name) AS g_r, grouping(n_name) AS g_n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_r, g_n, r_name, n_name"""),

    // -- CUBE
    dual("q21_cube", """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total,
        grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority"""),

    // -- explicit GROUPING SETS
    dual("q22_grouping_sets", """
      SELECT l_returnflag, l_linestatus, count(*) AS n,
        grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, l_returnflag, l_linestatus"""),

    // -- ranking family (rank/dense_rank/row_number)
    dual("q23_window_rank", """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        rank()       OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rnk,
        dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk,
        row_number() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
      WHERE l_suppkey < 3
      ORDER BY l_suppkey, rn"""),

    // -- running total: ROWS UNBOUNDED PRECEDING .. CURRENT ROW
    dual("q24_window_running", """
      SELECT o_custkey, o_orderkey, o_orderdate,
        cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total,
        count(*) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
      FROM orders
      WHERE o_custkey < 30
      ORDER BY o_custkey, o_orderkey"""),

    // -- moving window: ROWS 2 PRECEDING .. CURRENT ROW (avg as sum/count)
    dual("q25_window_moving", """
      SELECT o_custkey, o_orderkey,
        cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double) /
        count(*) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
      FROM orders
      WHERE o_custkey < 30
      ORDER BY o_custkey, o_orderkey"""),

    // -- RANGE frame (peers included on ties — TOK_WINDOWVALUES)
    dual("q26_window_range", """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        cast(sum(cast(l_quantity as decimal(18,2))) OVER (
          PARTITION BY l_suppkey ORDER BY l_quantity
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS range_cum_qty
      FROM lineitem
      WHERE l_suppkey < 3
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""),

    // -- lead/lag/first_value/last_value with explicit frames
    dual("q27_lead_lag", """
      SELECT o_custkey, o_orderkey,
        lag(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_key,
        lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key,
        lag(o_orderkey, 2, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2_key,
        first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_key,
        last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
      FROM orders
      WHERE o_custkey < 30
      ORDER BY o_custkey, o_orderkey"""),

    // -- ntile / percent_rank / cume_dist
    dual("q28_ntile_percent", """
      SELECT o_orderkey,
        ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
        percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr,
        cume_dist() OVER (ORDER BY o_totalprice, o_orderkey) AS cd
      FROM orders
      WHERE o_custkey < 30
      ORDER BY o_orderkey"""),

    // -- statistical aggregates (GenericUDAFVariance family,
    //    FunctionRegistry.java:370-379); order-sensitive → rounded
    dual("q29_stats_agg", """
      SELECT l_returnflag,
        round(stddev_samp(l_quantity), 6) AS sd_qty,
        round(stddev_pop(l_quantity), 6) AS sdp_qty,
        round(var_samp(l_quantity), 6) AS var_qty,
        round(var_pop(l_quantity), 6) AS varp_qty,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
        round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),

    // -- top-N per group (row_number + filter — Hive's TopNHash pattern)
    dual("q30_top_n_per_group", """
      SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          row_number() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t
      WHERE rn <= 3
      ORDER BY c_mktsegment, rn"""),

    // -- tumbling time window over the events stream table (batch parity of
    //    the Structured Streaming path, SURVEY §2.7)
    sqlQ("q31_events_tumble", """
      SELECT window.start AS wstart, event_type, count(*) AS n,
        cast(sum(cast(value as decimal(18,6))) as double) AS total_value
      FROM events
      GROUP BY window(ts, '1 day'), event_type
      ORDER BY wstart, event_type""", """
      SELECT date_trunc('day', ts::TIMESTAMP) AS wstart, event_type, count(*) AS n,
        cast(sum(cast(value as decimal(18,6))) as double) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY wstart, event_type"""),

    // -- sliding time window (1-day windows every 12h: each event lands
    //    in exactly two windows); the oracle replicates the window
    //    assignment arithmetically on the 12h grid
    sqlQ("q137_events_sliding", """
      SELECT window.start AS wstart, count(*) AS n,
        cast(sum(cast(value as decimal(18,6))) as double) AS total_value
      FROM events
      GROUP BY window(ts, '1 day', '12 hours')
      ORDER BY wstart""", """
      WITH e AS (
        SELECT ts::TIMESTAMP AS ts, value,
          epoch_us(ts::TIMESTAMP) // 43200000000 AS slot
        FROM events
      ), assigned AS (
        SELECT make_timestamp((slot - k) * 43200000000) AS wstart, value
        FROM e, (SELECT unnest([0, 1]) AS k) g
      )
      SELECT wstart, count(*) AS n,
        cast(sum(cast(value as decimal(18,6))) as double) AS total_value
      FROM assigned
      GROUP BY wstart
      ORDER BY wstart"""),

    // -- native session windows (session_window operator, 30-min gap):
    //    same gap semantics as q121's lag+running-id sessionization, so
    //    that oracle's session starts/sizes carry over (the operator's
    //    window.end = last event + gap, deliberately not compared)
    sqlQ("q138_session_window", """
      SELECT user_id, unix_millis(session_window.start) AS start_ms,
        count(*) AS n_events
      FROM events
      GROUP BY session_window(ts, '30 minutes'), user_id
      ORDER BY user_id, start_ms""", """
      WITH e AS (
        SELECT user_id, epoch_ms(ts::TIMESTAMP) AS ts_ms FROM events
      ), d AS (
        SELECT user_id, ts_ms,
          CASE WHEN lag(ts_ms) OVER w IS NULL
                 OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0
          END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
      ), s AS (
        SELECT user_id, ts_ms,
          count(*) FILTER (WHERE brk = 1) OVER (
            PARTITION BY user_id ORDER BY ts_ms
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM d
      )
      SELECT user_id, min(ts_ms) AS start_ms, count(*) AS n_events
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, start_ms""")
  )
}
