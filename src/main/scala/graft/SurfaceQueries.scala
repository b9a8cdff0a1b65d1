package graft

import Queries._

/** Remaining HiveQL language surface (SURVEY §2.9): DISTRIBUTE BY /
  * SORT BY / CLUSTER BY, bucket TABLESAMPLE, INTERSECT/EXCEPT, TRANSFORM
  * scripts, VALUES, views, NULL ordering. */
object SurfaceQueries {

  def all: Seq[Q] = Seq(
    // -- DISTRIBUTE BY + SORT BY (ReduceSinkOperator partition/sort cols,
    //    exec/ReduceSinkOperator.java:62-136). Row-set-preserving: the
    //    oracle checks content; the plan check lives in PlanSpec.
    sqlQ("q64_distribute_sort_by", """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      WHERE l_suppkey < 5
      DISTRIBUTE BY l_suppkey SORT BY l_suppkey, l_orderkey, l_linenumber""", """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      WHERE l_suppkey < 5"""),

    // -- CLUSTER BY ≡ DISTRIBUTE BY + SORT BY on the same cols
    sqlQ("q65_cluster_by", """
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey < 20
      CLUSTER BY o_custkey""", """
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey < 20"""),

    // -- bucket TABLESAMPLE semantics (parse/TableSample.java): Hive's
    //    bucket function for int keys is value % n — reproduced exactly
    sqlQ("q66_tablesample_bucket", """
      SELECT count(*) AS n, min(l_orderkey) AS min_k, max(l_orderkey) AS max_k
      FROM lineitem
      WHERE pmod(l_orderkey, 4) = 0""", """
      SELECT count(*) AS n, min(l_orderkey) AS min_k, max(l_orderkey) AS max_k
      FROM lineitem
      WHERE l_orderkey % 4 = 0"""),

    // -- INTERSECT / EXCEPT (additive over Hive 1.2 — Spark-native)
    dual("q67_intersect", """
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nk"""),
    dual("q68_except", """
      SELECT n_nationkey AS nk FROM nation
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nk"""),

    // -- TRANSFORM script (ScriptOperator, exec/ScriptOperator.java:64):
    //    delimited no-serde contract through /bin/cat
    sqlQ("q69_transform_script", """
      SELECT TRANSFORM(l_orderkey, l_linenumber)
        USING '/bin/cat' AS (k STRING, v STRING)
      FROM (SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_orderkey < 40
            ORDER BY l_orderkey, l_linenumber) t""", """
      SELECT l_orderkey::VARCHAR AS k, l_linenumber::VARCHAR AS v
      FROM lineitem WHERE l_orderkey < 40"""),

    // -- inline VALUES relation
    dual("q70_values_inline", """
      SELECT t.name, t.factor * 2 AS f2
      FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) AS t(name, factor)
      ORDER BY t.name"""),

    // -- view definition + query through it (DDLTask CREATE VIEW path)
    Q("q71_view", (s, d) => {
      Tables.register(s, d)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW big_cust AS
               SELECT c_custkey, c_name, c_acctbal FROM customer
               WHERE c_acctbal > 5000""")
      s.sql("""SELECT count(*) AS n,
                 cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS total
               FROM big_cust""")
    }, Some("""
      SELECT count(*) AS n,
        cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS total
      FROM customer WHERE c_acctbal > 5000""")),

    // -- explicit NULL ordering (Hive: NULLS FIRST asc / NULLS LAST desc)
    dual("q72_null_ordering", """
      SELECT o_orderkey, l_orderkey, l_quantity
      FROM orders
      LEFT JOIN lineitem ON l_orderkey = o_orderkey AND l_quantity > 49
      WHERE o_orderkey < 200
      ORDER BY l_quantity ASC NULLS FIRST, o_orderkey
      LIMIT 50""")
  )
}
