package graft

import org.apache.spark.sql.functions._

import Queries._

/** Round-12 queries: the distributed exact-quantile SELECTION plan as a
  * continuously-benchmarked front-door query (VERDICT r11 #5 — the
  * selection path was proven correct and 1.40× faster at 80 M rows in
  * QuantileScaleDrive, but no headline query exercised it, so a plan
  * regression would only surface in a one-off drive).
  */
object Round8Queries {

  def all: Seq[Q] = Seq(

    // -- Exact rank-selected quantiles over a 3-value group column: the
    //    funnel scenario the selection path exists for (a per-group sort
    //    window would push the whole table through 3 tasks at 100 TB).
    //    The threshold is pinned low for THIS query so the selection
    //    plan runs at every SF — the bench times the plan that would be
    //    chosen automatically once any group tops 2 M rows; correctness
    //    is gated by the same rank-arithmetic oracle as the sort path
    //    (both are exact and agree bit-for-bit).
    dfQ("q234_quantile_select", """
      WITH ranked AS (
        SELECT l_returnflag AS grp, l_extendedprice AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem WHERE l_extendedprice IS NOT NULL)
      SELECT grp,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.25)) THEN v END) AS p25,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.5))  THEN v END) AS p50,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.75)) THEN v END) AS p75,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.99)) THEN v END) AS p99
      FROM ranked GROUP BY 1""") { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
      // r15: force the SELECTION path directly (rankPath=select) —
      // this query exists to bench that plan at every SF, so paying
      // the dispatcher's sizing scan each run measured only overhead
      // (the previous low-threshold force reached the same plan). The
      // dispatcher's auto arm stays continuously benched by q235.
      val prev = s.conf.get("spark.graft.stats.rankPath", "auto")
      s.conf.set("spark.graft.stats.rankPath", "select")
      try
        operators.Stats.rankQuantiles(li, "grp", "v", Seq(
          "p25" -> BigDecimal("0.25"), "p50" -> BigDecimal("0.5"),
          "p75" -> BigDecimal("0.75"), "p99" -> BigDecimal("0.99")))
      finally s.conf.set("spark.graft.stats.rankPath", prev)
    },

    // -- The same quantile dispatcher at the DEFAULT 2 M threshold
    //    (VERDICT r12 #8): at sf1 lineitem's largest l_returnflag group
    //    (~3 M rows) crosses it, so the sf1 bench exercises the
    //    SELECTION plan exactly as a production config would choose it —
    //    un-forced; at the correctness SF (0.01) the same call takes the
    //    per-group sort-window path, gating the dispatcher's other arm
    //    against the identical rank-arithmetic oracle.
    dfQ("q235_quantile_natural", """
      WITH ranked AS (
        SELECT l_returnflag AS grp, l_extendedprice AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem WHERE l_extendedprice IS NOT NULL)
      SELECT grp,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.5))  THEN v END) AS p50,
        max(CASE WHEN rn = greatest(1, ceil(n * 0.95)) THEN v END) AS p95
      FROM ranked GROUP BY 1""") { (s, d) =>
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
      operators.Stats.rankQuantiles(li, "grp", "v", Seq(
        "p50" -> BigDecimal("0.5"), "p95" -> BigDecimal("0.95")))
    })
}
