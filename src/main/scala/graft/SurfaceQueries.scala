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
      LIMIT 50"""),

    // -- interval arithmetic (INTERVAL_YEAR_MONTH / INTERVAL_DAY_TIME,
    //    FunctionRegistry.java:356-357)
    dual("q73_intervals", """
      SELECT o_orderkey,
        o_orderdate + INTERVAL 1 MONTH AS plus_month,
        o_orderdate + INTERVAL 10 DAY AS plus_days,
        o_orderdate - INTERVAL 2 YEAR AS minus_years
      FROM orders
      WHERE o_orderkey < 100
      ORDER BY o_orderkey"""),

    // -- complex type constructors + access (array/map/struct, SURVEY §1.2)
    sqlQ("q74_complex_types", """
      SELECT n_nationkey,
        array(n_nationkey, n_regionkey)[0] AS arr_first,
        size(array(n_nationkey, n_regionkey, 99)) AS arr_len,
        sort_array(array(n_regionkey, n_nationkey))[0] AS arr_min,
        array_contains(array(n_nationkey, n_regionkey), 0) AS has_zero,
        map('nk', n_nationkey, 'rk', n_regionkey)['rk'] AS map_rk,
        struct(n_name, n_regionkey).n_name AS s_name,
        named_struct('k', n_nationkey, 'v', n_name).v AS ns_v
      FROM nation
      ORDER BY n_nationkey""", """
      SELECT n_nationkey,
        [n_nationkey, n_regionkey][1] AS arr_first,
        len([n_nationkey, n_regionkey, 99]) AS arr_len,
        list_sort([n_regionkey, n_nationkey])[1] AS arr_min,
        list_contains([n_nationkey, n_regionkey], 0) AS has_zero,
        n_regionkey AS map_rk,
        n_name AS s_name,
        n_name AS ns_v
      FROM nation
      ORDER BY n_nationkey"""),

    // -- xpath family (FunctionRegistry.java:288-297) — Spark built-ins;
    //    constant-folded documents, oracle provides expected literals
    sqlQ("q75_xpath", """
      SELECT r_regionkey,
        xpath_string('<a><b>hello</b></a>', 'a/b') AS xs,
        xpath_int('<a><b>7</b></a>', 'a/b') AS xi,
        xpath('<a><b>x</b><b>y</b></a>', 'a/b/text()')[1] AS x2,
        xpath_boolean('<a><b>1</b></a>', 'a/b = 1') AS xb
      FROM region
      ORDER BY r_regionkey""", """
      SELECT r_regionkey, 'hello' AS xs, 7 AS xi, 'y' AS x2, true AS xb
      FROM region
      ORDER BY r_regionkey"""),

    // -- parse_url family (FunctionRegistry.java:247)
    sqlQ("q76_parse_url", """
      SELECT doc_id,
        parse_url(u, 'HOST') AS host,
        parse_url(u, 'PATH') AS path,
        parse_url(u, 'QUERY', 'id') AS qid
      FROM (SELECT doc_id,
              concat('https://corpus.example.com/', source, '/doc?id=',
                     cast(doc_id AS string)) AS u
            FROM documents WHERE doc_id < 20) t
      ORDER BY doc_id""", """
      SELECT doc_id, 'corpus.example.com' AS host,
        concat('/', source, '/doc') AS path,
        cast(doc_id AS VARCHAR) AS qid
      FROM documents WHERE doc_id < 20
      ORDER BY doc_id"""),

    // -- compute_stats semantics (GenericUDAFComputeStats, ref :390):
    //    count/min/max/null-count/NDV summary per column
    dual("q77_compute_stats", """
      SELECT count(l_quantity) AS cnt,
        count(*) - count(l_quantity) AS num_nulls,
        min(l_quantity) AS min_v, max(l_quantity) AS max_v,
        count(DISTINCT l_quantity) AS ndv_exact
      FROM lineitem"""),

    // -- numeric bases + bit ops (conv/bin/hex/unhex/shifts,
    //    FunctionRegistry.java:214-220, 301-303)
    sqlQ("q90_bits_bases", """
      SELECT l_orderkey,
        bin(l_orderkey) AS b2,
        lower(hex(l_orderkey)) AS b16,
        conv(cast(l_orderkey AS string), 10, 2) AS conv2,
        shiftleft(l_orderkey, 2) AS shl,
        shiftright(l_orderkey, 1) AS shr,
        l_orderkey & 15 AS band, l_orderkey | 16 AS bor, l_orderkey ^ 5 AS bxor
      FROM lineitem
      WHERE l_orderkey < 60
      GROUP BY l_orderkey
      ORDER BY l_orderkey""", """
      SELECT l_orderkey,
        bin(l_orderkey) AS b2,
        lower(to_hex(l_orderkey)) AS b16,
        bin(l_orderkey) AS conv2,
        l_orderkey << 2 AS shl,
        l_orderkey >> 1 AS shr,
        l_orderkey & 15 AS band, l_orderkey | 16 AS bor,
        xor(l_orderkey, 5) AS bxor
      FROM lineitem
      WHERE l_orderkey < 60
      GROUP BY l_orderkey
      ORDER BY l_orderkey"""),

    // -- string distance (levenshtein, FunctionRegistry.java:190)
    sqlQ("q91_levenshtein", """
      SELECT p_partkey, levenshtein(p_name, 'small anvil') AS dist
      FROM part WHERE p_partkey < 60
      ORDER BY p_partkey""", """
      SELECT p_partkey, levenshtein(p_name, 'small anvil') AS dist
      FROM part WHERE p_partkey < 60
      ORDER BY p_partkey"""),

    // -- in_file (GenericUDFInFile, ref :425) through the gate: the query
    //    materializes its lookup file, the oracle states the semantics
    Q("q92_in_file", (s, d) => {
      Tables.register(s, d)
      val f = java.io.File.createTempFile("graft-regions", ".txt")
      f.deleteOnExit()
      java.nio.file.Files.writeString(f.toPath, "ASIA\nEUROPE\n")
      s.sql(s"""
        SELECT r_name, in_file(r_name, '${f.getAbsolutePath}') AS in_set
        FROM region ORDER BY r_name""")
    }, Some("""
      SELECT r_name, r_name IN ('ASIA', 'EUROPE') AS in_set
      FROM region ORDER BY r_name""")),

    // -- remaining string builtins (space/elt/find_in_set/initcap/
    //    format_number/printf/substring_index, FunctionRegistry §2.5);
    //    constant args ⇒ oracle supplies expected literals
    sqlQ("q93_string_builtins", """
      SELECT r_regionkey,
        concat('[', space(3), ']') AS sp,
        elt(2, 'a', r_name, 'c') AS e2,
        find_in_set(r_name, 'ASIA,EUROPE,AFRICA') AS fis,
        initcap(lower(r_name)) AS ic,
        format_number(1234567.891, 2) AS fmt,
        printf('%05d|%s', r_regionkey, r_name) AS pf,
        substring_index('a.b.c', '.', 2) AS si
      FROM region
      ORDER BY r_regionkey""", """
      SELECT r_regionkey,
        '[   ]' AS sp,
        r_name AS e2,
        CASE r_name WHEN 'ASIA' THEN 1 WHEN 'EUROPE' THEN 2
                    WHEN 'AFRICA' THEN 3 ELSE 0 END AS fis,
        list_aggregate(list_transform(string_split(lower(r_name), ' '),
          w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS ic,
        '1,234,567.89' AS fmt,
        printf('%05d|%s', r_regionkey, r_name) AS pf,
        'a.b' AS si
      FROM region
      ORDER BY r_regionkey"""),

    // -- str_to_map over column-built strings (FunctionRegistry.java:245)
    sqlQ("q94_str_to_map", """
      SELECT n_nationkey,
        str_to_map(concat('nk:', n_nationkey, ',rk:', n_regionkey))['nk'] AS nk_s,
        str_to_map(concat('nk:', n_nationkey, ',rk:', n_regionkey))['rk'] AS rk_s
      FROM nation
      ORDER BY n_nationkey""", """
      SELECT n_nationkey,
        n_nationkey::VARCHAR AS nk_s,
        n_regionkey::VARCHAR AS rk_s
      FROM nation
      ORDER BY n_nationkey"""),

    // -- approx_count_distinct (HLL — the modern compute_stats NDV path);
    //    bounded-error check, exact value differs from DuckDB's HLL
    // ndv_exact oracles directly; the HLL++ estimate is oracle'd as a
    // bounded-relative-error invariant (DuckDB cannot reproduce Spark's
    // sketch, but it CAN assert the bound holds → `true` on both sides)
    sqlQ("q78_approx_ndv", """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS ndv_exact,
        abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
          <= 0.1 * count(DISTINCT l_partkey) AS approx_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS ndv_exact,
        true AS approx_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // -- CREATE TEMPORARY MACRO (ref: ql/parse/MacroSemanticAnalyzer.java,
    //    TOK_CREATEMACRO): macros expand to inline Catalyst expressions at
    //    plan time, so the oracle is literally the hand-expanded SQL — hash
    //    equality proves the substitution is exact
    dfQ("q139_macro", """
      SELECT CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'high' END AS qband,
        cast(sum(cast(l_extendedprice AS decimal(12,2)) *
          (1 - cast(l_discount AS decimal(12,2)))) AS double) AS revenue,
        count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY qband""") { (s, _) =>
      graft.functions.Macros.sql(s, """CREATE TEMPORARY MACRO net_price(
        p DOUBLE, d DOUBLE)
        cast(p AS decimal(12,2)) * (1 - cast(d AS decimal(12,2)))""")
      graft.functions.Macros.sql(s, """CREATE TEMPORARY MACRO qty_band(
        q DOUBLE) CASE WHEN q < 10 THEN 'low' WHEN q < 30 THEN 'mid'
        ELSE 'high' END""")
      s.sql("""
        SELECT qty_band(l_quantity) AS qband,
          cast(sum(net_price(l_extendedprice, l_discount)) AS double)
            AS revenue,
          count(*) AS n
        FROM lineitem GROUP BY qty_band(l_quantity) ORDER BY qband""")
    }
  )
}
