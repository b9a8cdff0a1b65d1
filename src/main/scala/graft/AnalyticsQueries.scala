package graft

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Graph, Sampling}
import Queries._

/** Round-4 analytics + sampling operators: exact triangle counting over
  * a hash-sampled graph, weighted reservoir sampling, and cohort
  * retention — each with a DuckDB oracle that recomputes the result
  * through an independent formulation. */
object AnalyticsQueries {

  def all: Seq[Q] = Seq(

    // -- Exact triangle counting (degree orientation) over the
    //    DOULION-style deterministically hash-sampled supplier
    //    co-purchase graph (same md5-keyed edge sampling discipline as
    //    q122/q155 — the sampled edge set is identical cross-engine).
    //    The oracle counts triangles through a completely different
    //    algorithm: the canonical a<b<c triple self-join.
    dfQ("q184_triangles", """
      WITH ps AS (
        SELECT DISTINCT l_orderkey AS o, l_suppkey::VARCHAR AS s
        FROM lineitem),
      e0 AS (
        SELECT DISTINCT a.s AS a, b.s AS b
        FROM ps a JOIN ps b ON a.o = b.o AND a.s < b.s),
      e AS (
        SELECT a, b FROM e0
        WHERE ('0x' || substr(md5(a || ':' || b), 1, 15))::BIGINT % 17 = 0),
      t AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (
        SELECT v AS node, count(*) AS triangles FROM (
          SELECT x AS v FROM t
          UNION ALL SELECT y AS v FROM t
          UNION ALL SELECT z AS v FROM t)
        GROUP BY 1),
      nodes AS (SELECT a AS node FROM e UNION SELECT b AS node FROM e)
      SELECT node, coalesce(triangles, 0) AS triangles
      FROM nodes LEFT JOIN pn USING (node)""") { (s, d) =>
      val ps = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o"),
          col("l_suppkey").cast("string").as("sv"))
        .distinct()
      val pairs = ps.join(ps.withColumnRenamed("sv", "sw"), "o")
        .filter(col("sv") < col("sw"))
        .select(col("sv").as("a"), col("sw").as("b"))
        .distinct()
      val sampled = pairs.filter(
        pmod(conv(substring(
            md5(concat(col("a"), lit(":"), col("b"))), 1, 15),
          16, 10).cast("long"), lit(17)) === 0)
      Graph.triangleCount(sampled, "a", "b")
    },

    // -- Weighted k-sample without replacement (Efraimidis–Spirakis):
    //    documents drawn proportionally to length; the oracle replays
    //    the identical key formula — deterministic hash uniform, one
    //    pow() per row — and the same id tie-break.
    dfQ("q185_weighted_sample", """
      SELECT doc_id, source, n_chars FROM documents
      WHERE doc_id IS NOT NULL AND n_chars > 0
      ORDER BY pow(
          (('0x' || substr(md5('es1:' || doc_id::VARCHAR), 1, 13))::BIGINT
            + 0.5) / 4503599627370496.0,
          1.0 / n_chars) DESC,
        doc_id::VARCHAR
      LIMIT 100""") { (s, d) =>
      Sampling.weightedSample(
        Tables.load(s, d, "documents").select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k = 100, seed = "es1")
    },

    // -- Weekly cohort retention over high-value purchases: cohort =
    //    Monday of first qualifying event; each cell counts users still
    //    active N weeks later. Exact integer date arithmetic end-to-end.
    dfQ("q186_retention", """
      WITH uw AS (
        SELECT DISTINCT user_id AS u, date_trunc('week', ts)::DATE AS wk
        FROM events
        WHERE event_type = 'purchase' AND value > 150
          AND user_id IS NOT NULL),
      c AS (SELECT u, min(wk) AS cohort_week FROM uw GROUP BY 1)
      SELECT cohort_week,
        (datediff('day', cohort_week, wk) // 7)::INT AS week_offset,
        count(DISTINCT u) AS n_users
      FROM uw JOIN c USING (u)
      GROUP BY 1, 2""") { (s, d) =>
      Funnel.cohortRetention(
        Tables.load(s, d, "events")
          .filter(col("event_type") === "purchase" && col("value") > 150),
        "user_id", "ts")
    }
  )
}
