package graft

import Queries._

/** Scalar/aggregate/generator function surface (SURVEY §2.3, §2.5, §2.6):
  * string/math/date/hash/conditional/cast families (Spark built-ins with
  * identical Hive names), the custom Hive-gap functions from
  * graft.functions.HiveCompat, and the UDTF generators.
  */
object FunctionQueries {

  def all: Seq[Q] = Seq(
    // -- string family (FunctionRegistry.java:179-261)
    sqlQ("q32_string_funcs", """
      SELECT p_partkey,
        concat(p_name, '|', p_brand) AS cat,
        concat_ws('-', p_brand, p_type) AS catws,
        upper(p_name) AS up, lower(p_brand) AS lo,
        substr(p_name, 1, 5) AS sub5,
        length(p_name) AS len,
        trim('  pad  ') AS trimmed,
        lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
        reverse(p_name) AS rev,
        replace(p_type, 'E', '3') AS repl,
        instr(p_name, 'o') AS pos_o,
        repeat(p_brand, 2) AS rep2,
        ascii(p_name) AS first_ascii,
        translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        regexp_replace(p_name, '[aeiou]', '_') AS devowel,
        regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num
      FROM part
      WHERE p_partkey < 50
      ORDER BY p_partkey""", """
      SELECT p_partkey,
        concat(p_name, '|', p_brand) AS cat,
        concat_ws('-', p_brand, p_type) AS catws,
        upper(p_name) AS up, lower(p_brand) AS lo,
        substr(p_name, 1, 5) AS sub5,
        length(p_name) AS len,
        trim('  pad  ') AS trimmed,
        lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
        reverse(p_name) AS rev,
        replace(p_type, 'E', '3') AS repl,
        instr(p_name, 'o') AS pos_o,
        repeat(p_brand, 2) AS rep2,
        ascii(p_name) AS first_ascii,
        translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num
      FROM part
      WHERE p_partkey < 50
      ORDER BY p_partkey"""),

    // -- math family (FunctionRegistry.java:192-235); libm-sensitive outputs
    //    rounded to kill last-ulp differences between engines
    dual("q33_math_funcs", """
      SELECT l_orderkey, l_linenumber,
        round(l_extendedprice, 1) AS r1,
        cast(floor(l_extendedprice) AS bigint) AS fl,
        cast(ceil(l_extendedprice) AS bigint) AS ce,
        abs(l_extendedprice * -1) AS ab,
        round(sqrt(l_quantity), 6) AS sq,
        round(ln(l_extendedprice), 6) AS lnp,
        round(log10(l_extendedprice), 6) AS lg10,
        round(exp(l_discount), 6) AS ex,
        round(power(l_quantity, 2), 1) AS p2,
        cast(sign(l_extendedprice - 30000) AS int) AS sg,
        cast(l_orderkey % 7 AS bigint) AS md,
        greatest(l_quantity, 25.0) AS gr, least(l_quantity, 25.0) AS le
      FROM lineitem
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber"""),

    // -- date/time family (FunctionRegistry.java:266-285)
    sqlQ("q34_date_funcs", """
      SELECT o_orderkey,
        year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        quarter(o_orderdate) AS q,
        date_trunc('month', o_orderdate) AS mstart,
        last_day(o_orderdate) AS mend,
        datediff(o_orderdate, timestamp '1995-01-01 00:00:00') AS days_since,
        date_format(o_orderdate, 'yyyy-MM') AS ym,
        unix_timestamp(o_orderdate) AS epoch_s
      FROM orders
      WHERE o_orderkey < 100
      ORDER BY o_orderkey""", """
      SELECT o_orderkey,
        year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        quarter(o_orderdate) AS q,
        date_trunc('month', o_orderdate) AS mstart,
        last_day(o_orderdate)::TIMESTAMP AS mend,
        date_diff('day', timestamp '1995-01-01 00:00:00', o_orderdate) AS days_since,
        strftime(o_orderdate, '%Y-%m') AS ym,
        epoch(o_orderdate)::BIGINT AS epoch_s
      FROM orders
      WHERE o_orderkey < 100
      ORDER BY o_orderkey"""),

    // -- get_json_object / JSON scalar path (FunctionRegistry.java:287) over
    //    events.props; oracle via shared regexp (duckdb json ext optional)
    sqlQ("q35_json_extract", """
      SELECT cast(get_json_object(props, '$.k') AS int) AS k, count(*) AS n
      FROM events
      GROUP BY 1 ORDER BY k""", """
      SELECT cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS int) AS k,
             count(*) AS n
      FROM events
      GROUP BY 1 ORDER BY k"""),

    // -- explode + LATERAL VIEW (UDTFOperator + LateralViewJoinOperator):
    //    word histogram over documents
    sqlQ("q36_explode_words", """
      SELECT word, count(*) AS n
      FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
      WHERE word != ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20""", """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word != ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20"""),

    // -- posexplode (GenericUDTFPosExplode)
    sqlQ("q37_posexplode", """
      SELECT doc_id, pos, word
      FROM documents
      LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
      WHERE doc_id < 5
      ORDER BY doc_id, pos""", """
      SELECT doc_id, i - 1 AS pos, words[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents
            WHERE doc_id < 5) t,
           LATERAL (SELECT unnest(generate_series(1, len(words))) AS i) g
      ORDER BY doc_id, pos"""),

    // -- stack / inline UDTFs (FunctionRegistry.java:434-439) over literals
    sqlQ("q38_stack", """
      SELECT r_name, tier, bonus FROM region
      LATERAL VIEW stack(2, 'gold', 10, 'silver', 5) t AS tier, bonus
      ORDER BY r_name, tier""", """
      SELECT r_name, tier, bonus FROM region
      CROSS JOIN (VALUES ('gold', 10), ('silver', 5)) AS t(tier, bonus)
      ORDER BY r_name, tier"""),

    // -- json_tuple UDTF
    sqlQ("q39_json_tuple", """
      SELECT event_type, cast(k AS int) AS k_int, count(*) AS n
      FROM events LATERAL VIEW json_tuple(props, 'k') t AS k
      GROUP BY event_type, k
      ORDER BY event_type, k_int""", """
      SELECT event_type,
             cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS int) AS k_int,
             count(*) AS n
      FROM events
      GROUP BY event_type, k_int
      ORDER BY event_type, k_int"""),

    // -- hash/crypto family (FunctionRegistry.java:221-234)
    sqlQ("q40_hash_funcs", """
      SELECT c_custkey,
        md5(c_name) AS h_md5,
        sha2(c_name, 256) AS h_sha256,
        base64(cast(c_name AS binary)) AS b64
      FROM customer
      WHERE c_custkey < 20
      ORDER BY c_custkey""", """
      SELECT c_custkey,
        md5(c_name) AS h_md5,
        sha256(c_name) AS h_sha256,
        to_base64(c_name::BLOB) AS b64
      FROM customer
      WHERE c_custkey < 20
      ORDER BY c_custkey"""),

    // -- conditionals (FunctionRegistry.java:319-337): nvl/coalesce/nullif/if
    sqlQ("q41_conditionals", """
      SELECT o_orderkey,
        nvl(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        if(o_totalprice > 100000, 'big', 'small') AS size_flag,
        coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW!') AS prio,
        CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 3 END AS status_code
      FROM orders
      WHERE o_orderkey < 200
      ORDER BY o_orderkey""", """
      SELECT o_orderkey,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_flag,
        coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW!') AS prio,
        CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 3 END AS status_code
      FROM orders
      WHERE o_orderkey < 200
      ORDER BY o_orderkey"""),

    // -- cast matrix (FunctionRegistry.java:345-361)
    dual("q42_casts", """
      SELECT l_orderkey,
        cast(l_quantity AS int) AS q_int,
        cast(l_quantity AS bigint) AS q_long,
        cast(l_orderkey AS double) AS k_dbl,
        cast(l_orderkey AS string) AS k_str,
        cast(cast(l_extendedprice AS decimal(12,2)) AS string) AS price_str,
        cast(l_shipdate AS date) AS ship_d,
        cast(cast(l_shipdate AS date) AS string) AS ship_s,
        cast(l_quantity > 25 AS boolean) AS q_big,
        cast(cast(l_quantity > 25 AS boolean) AS int) AS q_big_i
      FROM lineitem
      WHERE l_orderkey < 60
      ORDER BY l_orderkey, l_linenumber"""),

    // -- custom: field() (GenericUDFField, ref :255)
    sqlQ("q43_field_func", """
      SELECT field(l_returnflag, 'R', 'A', 'N') AS flag_idx, count(*) AS n
      FROM lineitem
      GROUP BY 1 ORDER BY flag_idx""", """
      SELECT CASE l_returnflag WHEN 'R' THEN 1 WHEN 'A' THEN 2 WHEN 'N' THEN 3
             ELSE 0 END AS flag_idx, count(*) AS n
      FROM lineitem
      GROUP BY 1 ORDER BY flag_idx"""),

    // -- custom: mask family (GenericUDFMask*, ref :463-468)
    sqlQ("q44_mask_funcs", """
      SELECT c_custkey,
        mask(c_name) AS m_all,
        mask_first_n(c_name, 4) AS m_first4,
        mask_last_n(c_name, 4) AS m_last4,
        mask_show_first_n(c_name, 4) AS m_show_first4,
        mask_show_last_n(c_name, 4) AS m_show_last4,
        mask_hash(c_name) AS m_hash
      FROM customer
      WHERE c_custkey < 20
      ORDER BY c_custkey""", """
      SELECT c_custkey,
        regexp_replace(regexp_replace(regexp_replace(c_name,
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS m_all,
        concat(regexp_replace(regexp_replace(regexp_replace(substr(c_name, 1, 4),
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'),
          substr(c_name, 5)) AS m_first4,
        concat(substr(c_name, 1, length(c_name) - 4),
          regexp_replace(regexp_replace(regexp_replace(
            substr(c_name, length(c_name) - 3),
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')) AS m_last4,
        concat(substr(c_name, 1, 4),
          regexp_replace(regexp_replace(regexp_replace(substr(c_name, 5),
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')) AS m_show_first4,
        concat(regexp_replace(regexp_replace(regexp_replace(
            substr(c_name, 1, length(c_name) - 4),
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'),
          substr(c_name, length(c_name) - 3)) AS m_show_last4,
        md5(c_name) AS m_hash
      FROM customer
      WHERE c_custkey < 20
      ORDER BY c_custkey"""),

    // -- custom: create_union (UNIONTYPE struct+tag encoding, SURVEY §1.2).
    //    The projection is scalar-only, so a DuckDB CASE reproduces it.
    sqlQ("q45_create_union", """
      SELECT o_orderkey, u.tag AS tag,
        CASE WHEN u.tag = 0 THEN u.field0 ELSE cast(u.field1 AS string) END AS value
      FROM (
        SELECT o_orderkey,
          create_union(if(o_totalprice > 100000, 0, 1),
                       o_orderstatus, o_totalprice) AS u
        FROM orders WHERE o_orderkey < 100) t
      ORDER BY o_orderkey""", """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 100000 THEN 0 ELSE 1 END AS tag,
        CASE WHEN o_totalprice > 100000 THEN o_orderstatus
             ELSE cast(o_totalprice AS varchar) END AS value
      FROM orders WHERE o_orderkey < 100
      ORDER BY o_orderkey"""),

    // -- histogram_numeric UDAF (GenericUDAFHistogramNumeric, ref :380;
    //    Spark has a native port of the same bin-merge algorithm).
    //    nbins = 50 = |distinct l_quantity| makes the result exact and
    //    merge-order-independent (every coalesced pair has gap 0), so the
    //    exploded bins oracle as a plain GROUP BY — the array column is
    //    flattened to rows for the driver's scalar compare.
    sqlQ("q46_histogram_numeric", """
      SELECT l_returnflag, round(b.x, 6) AS bin_x, round(b.y, 6) AS bin_y
      FROM (SELECT l_returnflag, histogram_numeric(l_quantity, 50) AS hist
            FROM lineitem GROUP BY l_returnflag) t
      LATERAL VIEW explode(hist) e AS b
      ORDER BY l_returnflag, bin_x""", """
      SELECT l_returnflag,
        round(cast(l_quantity AS double), 6) AS bin_x,
        round(cast(count(*) AS double), 6) AS bin_y
      FROM lineitem GROUP BY 1, l_quantity
      ORDER BY l_returnflag, bin_x"""),

    // -- sentences() text op (FunctionRegistry.java:419; seed of the text
    //    pipeline) — Spark built-in. The corpus is punctuation-free, so
    //    BreakIterator yields one sentence of whitespace-split words; the
    //    nested array is canonicalized via to_json for the compare.
    sqlQ("q47_sentences", """
      SELECT doc_id, to_json(sentences(text)) AS sents
      FROM documents WHERE doc_id < 10 ORDER BY doc_id""", """
      SELECT doc_id,
        to_json([list_filter(regexp_split_to_array(text, ' +'), x -> x != '')])
          AS sents
      FROM documents WHERE doc_id < 10 ORDER BY doc_id"""),

    // -- collect_set/collect_list (ref :382-383), canonicalized by sort +
    //    to_json (array columns crash the driver's pandas compare raw)
    sqlQ("q48_collect", """
      SELECT l_returnflag,
        to_json(sort_array(collect_set(l_linestatus))) AS statuses,
        size(collect_list(l_linestatus)) AS n_all
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""", """
      SELECT l_returnflag,
        to_json(list_sort(list(DISTINCT l_linestatus))) AS statuses,
        count(l_linestatus) AS n_all
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // -- percentile family (exact: GenericUDAFPercentile ref :392;
    //    approx: :381)
    sqlQ("q49_percentiles", """
      SELECT l_returnflag,
        round(percentile(l_quantity, 0.5), 6) AS p50,
        round(percentile(l_quantity, 0.9), 6) AS p90,
        round(percentile(l_extendedprice, 0.25), 4) AS p25_price
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""", """
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  )
}
