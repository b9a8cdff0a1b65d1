package graft

import Queries._

/** Relational-core parity (SURVEY §2.1, §2.9): scan/filter/project,
  * all join types, aggregation, having, distinct, union, order/limit,
  * subqueries, CTEs. Reference operators: FilterOperator, SelectOperator,
  * GroupByOperator, JoinOperator/CommonJoinOperator (INNER/LEFT/RIGHT/FULL/
  * LEFTSEMI, ql/plan/JoinDesc.java:42-47), UnionOperator, LimitOperator,
  * ReduceSinkOperator (shuffle boundary).
  *
  * All expressed declaratively so Catalyst plans partial aggregation,
  * broadcast joins (small dims), and pushes filters/projection to the
  * parquet scan — the properties that hold at 100 TB.
  */
object RelationalQueries {

  /** Exact decimal sum of a 2-dp double column, returned as double. */
  private def dsum(e: String) = s"cast(sum(cast($e as decimal(18,2))) as double)"
  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  private val REV =
    "cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))"
  private val CHARGE =
    s"cast($REV as decimal(18,4)) * (1 + cast(l_tax as decimal(12,2)))"

  def all: Seq[Q] = Seq(
    // -- scan + filter + group + sort: TPC-H Q1 shape (ref qtest groupby*)
    dual("q01_agg_filter", s"""
      SELECT l_returnflag, l_linestatus,
        ${dsum("l_quantity")} AS sum_qty,
        ${dsum("l_extendedprice")} AS sum_base_price,
        cast(sum($REV) as double) AS sum_disc_price,
        cast(sum($CHARGE) as double) AS sum_charge,
        ${dsum("l_quantity")} / count(*) AS avg_qty,
        ${dsum("l_extendedprice")} / count(*) AS avg_price,
        ${dsum("l_discount")} / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),

    // -- projection + predicates (LIKE / IN / BETWEEN)
    dual("q02_project_filter", """
      SELECT p_partkey, p_name, p_brand,
        upper(p_type) AS type_u, p_size * 10 AS size10,
        cast(cast(p_retailprice as decimal(12,2)) * 2 as double) AS double_price
      FROM part
      WHERE p_size BETWEEN 10 AND 40
        AND p_type IN ('ECONOMY', 'SMALL', 'STANDARD')
        AND p_name LIKE '%bolt%'
      ORDER BY p_partkey"""),

    // -- 3-way join + agg + top-N (TPC-H Q3 shape; TakeOrderedAndProject)
    dual("q03_join_agg_topn", s"""
      SELECT o_orderkey, cast(sum($REV) as double) AS revenue,
             o_orderdate, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < timestamp '2000-03-15 00:00:00'
        AND l_shipdate > timestamp '1996-03-15 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""),

    // -- left outer join with nulls surviving to the agg
    dual("q04_join_left_outer", """
      SELECT o_orderstatus,
        count(*) AS n_rows,
        count(l_orderkey) AS n_matched,
        count(*) - count(l_orderkey) AS n_null
      FROM orders
      LEFT JOIN lineitem
        ON l_orderkey = o_orderkey
       AND l_quantity > 45
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),

    // -- 6-table join (TPC-H Q5 shape): dims broadcast, fact shuffles once
    dual("q05_multi_join", s"""
      SELECT r_name, n_name, cast(sum($REV) as double) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= timestamp '1996-01-01 00:00:00'
        AND o_orderdate < timestamp '1999-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY revenue DESC, n_name"""),

    // -- left semi join (Hive's only semi form, JoinDesc.LEFT_SEMI_JOIN)
    sqlQ("q06_semi_join", """
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer LEFT SEMI JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 100000
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""", """
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),

    // -- anti join (Hive 1.2 rewrites NOT EXISTS to outer-join+null-filter,
    //    parse/QBSubQuery.java; Spark has it natively)
    sqlQ("q07_anti_join", """
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer LEFT ANTI JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 100000
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""", """
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),

    // -- full outer join, nulls coalesced into group keys
    dual("q08_full_outer", """
      SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        count(DISTINCT c_custkey) AS n_cust,
        count(DISTINCT s_suppkey) AS n_supp
      FROM customer
      FULL JOIN supplier ON c_nationkey = s_nationkey
      GROUP BY coalesce(c_nationkey, s_nationkey)
      ORDER BY nationkey"""),

    // -- explicit cross join (ref: CrossProductCheck.java flags these)
    dual("q09_cross_join", """
      SELECT r_name, n_name
      FROM region CROSS JOIN nation
      ORDER BY r_name, n_name"""),

    // -- UNION ALL (UnionOperator)
    dual("q10_union_all", """
      SELECT nk, count(*) AS n FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION ALL
        SELECT s_nationkey AS nk FROM supplier
      ) u GROUP BY nk ORDER BY nk"""),

    // -- UNION DISTINCT
    dual("q11_union_distinct", """
      SELECT count(*) AS n_distinct_nk FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
      ) u"""),

    // -- multi-distinct aggregation (ReduceSink tag machinery in the ref;
    //    Spark plans Expand + two-phase agg)
    dual("q12_distinct_agg", """
      SELECT l_returnflag,
        count(DISTINCT l_suppkey) AS nd_supp,
        count(DISTINCT l_partkey) AS nd_part,
        count(DISTINCT l_orderkey) AS nd_order,
        count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),

    // -- HAVING over aggregate
    dual("q13_groupby_having", s"""
      SELECT l_suppkey, ${dsum("l_quantity")} AS total_qty, count(*) AS n
      FROM lineitem
      GROUP BY l_suppkey
      HAVING count(*) > 100 AND ${dsum("l_quantity")} > 500
      ORDER BY l_suppkey"""),

    // -- CASE WHEN buckets + conditional agg (FILTER clause)
    dual("q14_case_when", """
      SELECT
        CASE WHEN o_totalprice < 50000 THEN 'small'
             WHEN o_totalprice < 150000 THEN 'medium'
             ELSE 'large' END AS bucket,
        count(*) AS n,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders
      GROUP BY 1
      ORDER BY bucket"""),

    // -- multi-column ORDER BY asc/desc + LIMIT
    dual("q15_orderby_limit", """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders
      ORDER BY o_orderdate DESC, o_totalprice ASC, o_orderkey
      LIMIT 25"""),

    // -- scalar subquery
    dual("q16_scalar_subquery", """
      SELECT count(*) AS n_above_avg
      FROM orders
      WHERE o_totalprice > (SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*) FROM orders)"""),

    // -- IN subquery (parse/QBSubQuery.java IN form)
    dual("q17_in_subquery", """
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey IN (0, 1))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),

    // -- NOT IN subquery (non-null keys; Hive rewrites to outer join)
    dual("q18_not_in_subquery", """
      SELECT count(*) AS n
      FROM part
      WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                              WHERE l_quantity >= 49)"""),

    // -- CTEs (TOK_CTE, HiveParser.g:340)
    dual("q19_cte", s"""
      WITH big_orders AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 150000
      ), cust_nation AS (
        SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      )
      SELECT n_name, count(*) AS n_big,
        cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS total
      FROM big_orders b JOIN cust_nation c ON b.o_custkey = c.c_custkey
      GROUP BY n_name
      ORDER BY n_name""")
  )
}
