package graft

import Queries._

/** Optimizer-stress relational depth (SURVEY §2.9 subqueries + §4 CBO):
  * correlated scalar/EXISTS/NOT-EXISTS subqueries, HAVING subqueries,
  * outer-join distributions, ratio-of-sums — the TPC-H shapes (Q4, Q8,
  * Q11, Q13, Q21, Q22 analogues on this schema) that exercise Catalyst's
  * subquery decorrelation and join reordering. Reference:
  * parse/QBSubQuery.java (Hive rewrites all of these to joins). */
object DepthQueries {

  private val REV =
    "cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))"

  def all: Seq[Q] = Seq(
    // -- correlated scalar subquery (per-group average comparison)
    dual("q79_corr_scalar_subquery", """
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
        SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*)
        FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey"""),

    // -- TPC-H Q4 shape: EXISTS with correlated date arithmetic
    dual("q80_exists_dated", """
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_orderdate >= timestamp '1996-01-01 00:00:00'
        AND o_orderdate < timestamp '1998-01-01 00:00:00'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),

    // -- TPC-H Q13 shape: left-join count distribution
    dual("q81_count_distribution", """
      SELECT n_orders, count(*) AS n_cust FROM (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) t
      GROUP BY n_orders
      ORDER BY n_cust DESC, n_orders"""),

    // -- TPC-H Q22 shape: uncorrelated scalar + correlated NOT EXISTS
    dual("q82_rich_inactive", """
      SELECT c_nationkey, count(*) AS n,
        cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS total
      FROM customer c
      WHERE c_acctbal > (
          SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*)
          FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""),

    // -- TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS
    dual("q83_multi_correlated", """
      SELECT s_suppkey, count(DISTINCT l1.l_orderkey) AS n
      FROM supplier
      JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
      WHERE l1.l_quantity > 45
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_quantity > 49)
      GROUP BY s_suppkey
      ORDER BY s_suppkey"""),

    // -- Hive division semantics: / yields double, div yields integer
    sqlQ("q84_division", """
      SELECT l_orderkey,
        l_orderkey / 7 AS q_dbl,
        l_orderkey div 7 AS q_int,
        l_orderkey % 7 AS md
      FROM lineitem
      WHERE l_orderkey < 50
      ORDER BY l_orderkey, l_linenumber""", """
      SELECT l_orderkey,
        l_orderkey / 7 AS q_dbl,
        l_orderkey // 7 AS q_int,
        l_orderkey % 7 AS md
      FROM lineitem
      WHERE l_orderkey < 50
      ORDER BY l_orderkey, l_linenumber"""),

    // -- TPC-H Q11 shape: HAVING against an uncorrelated scalar subquery
    dual("q85_having_subquery", s"""
      SELECT l_partkey, cast(sum($REV) AS double) AS value
      FROM lineitem
      GROUP BY l_partkey
      HAVING cast(sum($REV) AS double) > (
        SELECT cast(sum($REV) AS double) * 1.6 / count(DISTINCT l_partkey)
        FROM lineitem)
      ORDER BY value DESC, l_partkey"""),

    // -- NULL group semantics: outer-join NULLs form their own group;
    //    count(col) skips NULLs while count(*) doesn't
    dual("q87_null_groups", """
      SELECT l_returnflag, count(*) AS n_rows, count(l_orderkey) AS n_li,
        count(*) - count(l_orderkey) AS n_unmatched
      FROM orders
      LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_quantity > 48
      GROUP BY l_returnflag
      ORDER BY l_returnflag NULLS FIRST"""),

    // -- three-valued IN over a subquery that can produce the empty set
    dual("q88_in_empty_subquery", """
      SELECT count(*) AS n
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 1e12)"""),

    // -- TPC-H Q19 shape: equi-join + theta residual (Hive evaluates
    //    non-equi terms as post-join filters in CommonJoinOperator)
    dual("q96_theta_residual_join", s"""
      SELECT p_brand, count(*) AS n, cast(sum($REV) AS double) AS revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_quantity BETWEEN p_size - 5 AND p_size + 5
        AND p_retailprice > 500
      GROUP BY p_brand
      ORDER BY p_brand"""),

    // -- TPC-H Q12 shape: join + CASE-bucketed conditional sums
    dual("q97_case_bucket_join", """
      SELECT
        CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 'high' ELSE 'low' END AS prio_class,
        count(*) AS n,
        count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
      FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
      GROUP BY 1
      ORDER BY prio_class"""),

    // -- nested CTEs + window + join composition (operator chaining)
    dual("q98_cte_window_join", """
      WITH cust_rank AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
      ), top_cust AS (
        SELECT * FROM cust_rank WHERE rn <= 5
      )
      SELECT n_name, count(*) AS n_top,
        cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS bal
      FROM top_cust
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""),

    // -- TPC-H Q8 shape: ratio of conditional exact sums (market share)
    dual("q86_market_share", s"""
      SELECT year(o_orderdate) AS o_year,
        cast(sum(CASE WHEN r_name = 'ASIA' THEN $REV
                      ELSE cast(0.00 AS decimal(25,4)) END) AS double) /
        cast(sum($REV) AS double) AS asia_share
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY year(o_orderdate)
      ORDER BY o_year"""),

    // -- TPC-H Q7 shape (volume shipping): supplier-nation × customer-
    //    nation pair flows, both directions, per year — two dimension
    //    joins feeding a pair filter + grouped exact-decimal revenue
    dual("q113_nation_volume", """
      SELECT supp_nation, cust_nation, l_year,
        cast(sum(volume) AS double) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          year(l_shipdate) AS l_year,
          cast(l_extendedprice AS decimal(12,2)) *
            (1 - cast(l_discount AS decimal(12,2))) AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""),

    // -- TPC-H Q19 shape: OR-of-ANDs join predicate (brand × size band ×
    //    quantity band) — the classic disjunctive-pushdown stress; the
    //    part side of each disjunct must still prune at the scan
    dual("q114_disjunctive_join", """
      SELECT cast(sum(cast(l_extendedprice AS decimal(12,2)) *
        (1 - cast(l_discount AS decimal(12,2)))) AS double) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE
        (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 1 AND 21)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
          AND l_quantity BETWEEN 10 AND 40)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
          AND l_quantity BETWEEN 20 AND 50)"""),

    // -- TPC-H Q17 shape: correlated AGGREGATE scalar subquery (quantity
    //    below 20% of the part's own average). The float-free rewrite
    //    5·q·cnt < sum keeps the boundary exact on both engines (an avg
    //    computed in doubles could flip near-boundary rows per engine)
    dual("q132_corr_avg_subquery", """
      SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double)
        / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
        AND cast(l_quantity AS decimal(18,2)) * 5 *
          (SELECT count(*) FROM lineitem l2
           WHERE l2.l_partkey = p_partkey)
          < (SELECT sum(cast(l_quantity AS decimal(18,2)))
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""),

    // -- TPC-H Q18 shape: IN over a grouped HAVING subquery (large-order
    //    customers)
    dual("q133_in_grouped_having", """
      SELECT c_custkey, o_orderkey, o_orderdate,
        cast(cast(o_totalprice AS decimal(18,2)) AS double) AS price
      FROM customer JOIN orders ON o_custkey = c_custkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(cast(l_quantity AS decimal(18,2))) > 250)
      ORDER BY o_orderkey"""),

    // -- TPC-H Q9 shape (no partsupp table in this schema): profit proxy
    //    by nation × order-year through a 5-table join
    dual("q134_profit_rollup", """
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
        cast(sum(cast(l_extendedprice AS decimal(12,2)) *
          (1 - cast(l_discount AS decimal(12,2)))) AS double) AS profit
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%a%'
      GROUP BY n_name, year(o_orderdate)
      ORDER BY nation, o_year"""),

    // -- TPC-H Q2 shape: correlated equality-to-min scalar subquery
    //    (the min-cost-supplier pattern; exact-decimal equality so the
    //    boundary can't drift between engines)
    dual("q135_corr_min_subquery", """
      SELECT l_partkey, l_suppkey,
        cast(cast(l_extendedprice AS decimal(18,2)) AS double) AS price
      FROM lineitem l
      WHERE cast(l_extendedprice AS decimal(18,2)) = (
        SELECT min(cast(l_extendedprice AS decimal(18,2)))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      ORDER BY l_partkey, l_suppkey"""),

    // -- TPC-H Q20 shape: nested IN chain (IN over a grouped HAVING over
    //    another IN) — two decorrelation layers
    dual("q136_nested_in_chain", """
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY l_suppkey
        HAVING sum(cast(l_quantity AS decimal(18,2))) > 100)
      ORDER BY s_suppkey"""),

    // -- TPC-H Q12 shape (no l_shipmode in this schema → l_returnflag as
    //    the mode dimension): two-level conditional counts via FILTER
    //    (count, not sum(CASE): DuckDB's sum(int) is HUGEINT and would
    //    break the compare)
    dual("q140_priority_counts", """
      SELECT l_returnflag AS mode,
        count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
          AS high_line_count,
        count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
          AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate AND year(l_shipdate) = 1997
      GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // -- TPC-H Q14 shape: promo revenue share per year — both sums exact
    //    decimal, cast to double only at the end; the FILTER'd sum is
    //    NULL for years with no promo rows on both engines
    dual("q141_promo_share", """
      SELECT year(l_shipdate) AS yr,
        cast(sum(cast(l_extendedprice AS decimal(12,2)) *
          (1 - cast(l_discount AS decimal(12,2))))
          FILTER (WHERE p_type = 'PROMO') AS double) AS promo_revenue,
        cast(sum(cast(l_extendedprice AS decimal(12,2)) *
          (1 - cast(l_discount AS decimal(12,2)))) AS double)
          AS total_revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY year(l_shipdate) ORDER BY yr"""),

    // -- TPC-H Q10 shape: returned-item revenue top-k per customer; the
    //    LIMIT boundary is made deterministic by the unique c_custkey
    //    tiebreak (revenue doubles are bit-identical per the decimal
    //    contract, so the tie comparison agrees across engines)
    dual("q142_returned_items", """
      SELECT c_custkey, c_name,
        cast(sum(cast(l_extendedprice AS decimal(12,2)) *
          (1 - cast(l_discount AS decimal(12,2)))) AS double) AS revenue,
        n_name, c_acctbal
      FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R' AND year(o_orderdate) BETWEEN 1996 AND 1997
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),

    // -- TPC-H Q15 shape: top supplier via a named revenue subquery +
    //    equality-to-max; the comparison runs on exact decimals so the
    //    max boundary cannot drift between engines
    dual("q143_top_supplier", """
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          sum(cast(l_extendedprice AS decimal(12,2)) *
            (1 - cast(l_discount AS decimal(12,2)))) AS total
        FROM lineitem WHERE year(l_shipdate) = 1996
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, cast(total AS double) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total = (SELECT max(total) FROM revenue)
      ORDER BY s_suppkey"""),

    // -- TPC-H Q16 shape: distinct-supplier counts over part attributes
    //    with a NOT IN exclusion subquery
    dual("q144_supplier_cnt", """
      SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%007%')
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  )
}
