package graft

import Queries._
import org.apache.spark.sql.functions._

/** Round-2 evidence-gap closers (VERDICT r01 "What's missing" #4 and
  * "do this" #5/#9): join types, UDTFs, and scalar functions that were
  * implemented-by-construction but had no green CORRECTNESS row.
  *
  * References: RIGHT OUTER in plan/JoinDesc.java:42-47; inline UDTF in
  * ql/exec/FunctionRegistry.java:434-439; encode/decode :236-237;
  * current_database/current_user :314-317; percentile_approx :381.
  */
object GapQueries {

  def all: Seq[Q] = Seq(
    // -- RIGHT OUTER JOIN: customers without orders must survive from the
    //    right side (TPC-H Q13 shape, mirrored)
    dual("q100_right_outer", """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM orders o RIGHT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey"""),

    // -- inline UDTF: explode an array of structs into columns
    sqlQ("q101_inline", """
      SELECT o_orderkey, i.k AS k, i.v AS v
      FROM orders
      LATERAL VIEW inline(array(
        named_struct('k', 'status',   'v', o_orderstatus),
        named_struct('k', 'priority', 'v', o_orderpriority))) i AS k, v
      WHERE o_orderkey < 20
      ORDER BY o_orderkey, k""", """
      SELECT o_orderkey, k, v FROM (
        SELECT o_orderkey, 'status' AS k, o_orderstatus AS v
        FROM orders WHERE o_orderkey < 20
        UNION ALL
        SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v
        FROM orders WHERE o_orderkey < 20)
      ORDER BY o_orderkey, k"""),

    // -- encode/decode binary round-trip + base64 of the encoded bytes
    sqlQ("q102_encode_decode", """
      SELECT n_nationkey,
        decode(encode(n_name, 'UTF-8'), 'UTF-8') AS roundtrip,
        base64(encode(n_name, 'UTF-8')) AS b64
      FROM nation ORDER BY n_nationkey""", """
      SELECT n_nationkey,
        decode(encode(n_name)) AS roundtrip,
        to_base64(encode(n_name)) AS b64
      FROM nation ORDER BY n_nationkey"""),

    // -- session-context functions; values pinned by the harness (Verify
    //    runs in the default database as the root user)
    sqlQ("q103_context_funcs", """
      SELECT current_database() AS db, current_user() AS usr,
        current_catalog() AS cat
      FROM nation WHERE n_nationkey = 0""", """
      SELECT 'default' AS db, 'root' AS usr, 'spark_catalog' AS cat
      FROM nation WHERE n_nationkey = 0"""),

    // -- percentile_approx parity: the sketch's rank error at
    //    accuracy=10000 is bounded; oracle the bound as an invariant plus
    //    the exact percentiles it must bracket (q49 covers exact already)
    sqlQ("q104_approx_percentile", """
      SELECT l_returnflag,
        abs(approx_percentile(l_quantity, 0.5, 10000)
          - percentile(l_quantity, 0.5)) <= 1.0 AS p50_ok,
        abs(approx_percentile(l_extendedprice, 0.9, 10000)
          - percentile(l_extendedprice, 0.9))
          <= 0.01 * percentile(l_extendedprice, 0.9) AS p90_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""", """
      SELECT l_returnflag, true AS p50_ok, true AS p90_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // -- real PNG IHDR decode: payloads are planted PNGs whose dimensions
    //    derive from the key, so the oracle recomputes them arithmetically
    //    while Spark must extract them from the actual header bytes
    dfQ("q105_png_headers", """
      SELECT o_orderkey AS id, 'image' AS kind, 'image/png' AS mime,
        o_orderkey % 1920 + 32 AS width, o_orderkey % 1080 + 32 AS height
      FROM orders WHERE o_orderkey < 200 ORDER BY id""") { (s, d) =>
      val planted = Tables.load(s, d, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey").as("doc_id"),
          unhex(concat(
            lit("89504E470D0A1A0A0000000D49484452"),
            lpad(hex((col("o_orderkey") % 1920 + 32).cast("int")), 8, "0"),
            lpad(hex((col("o_orderkey") % 1080 + 32).cast("int")), 8, "0"),
            lit("0806000000"))).as("payload"))
      graft.operators.Multimodal
        .withDecodedMeta(planted, "doc_id", "payload", kind = "image")
        .select(col("id"), col("meta.kind").as("kind"),
          col("meta.mimeType").as("mime"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .orderBy("id")
    }
  )
}
