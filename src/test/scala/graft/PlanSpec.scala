package graft

import org.apache.spark.sql.functions._

/** Plan-quality assertions — the properties that make queries survive a
  * 100× scale-up: filter/projection pushdown to the parquet scan,
  * broadcast joins for small dims, whole-stage codegen (no interpreted
  * UDFs), partial aggregation, and shuffle elision where layout allows. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.register(spark, dir)
  }

  private def plan(name: String): String =
    Queries.byName(name).run(spark, dir).queryExecution.executedPlan.toString

  test("q01 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q01_agg_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter must reach parquet:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "untouched columns must not be read")
  }

  test("q01 aggregates in two phases (partial + final)") {
    val p = plan("q01_agg_filter")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("q05 six-table join broadcasts the small dimensions") {
    val p = plan("q05_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dims (nation/region/supplier) must broadcast:\n$p")
  }

  test("whole-stage codegen covers the relational core queries") {
    for (q <- Seq("q01_agg_filter", "q03_join_agg_topn", "q13_groupby_having")) {
      val p = Queries.byName(q).run(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      assert(p.contains("WholeStageCodegen subtrees"), s"$q lost codegen:\n${p.take(400)}")
    }
  }

  test("no interpreted ScalaUDF anywhere in the query inventory") {
    for (q <- Queries.all) {
      val p = Queries.byName(q.name).run(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("ScalaUDF"), s"${q.name} uses a UDF:\n$p")
    }
  }

  test("top-N order+limit plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q15_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), s"top-N must not global-sort:\n$p")
  }

  test("semi/anti joins plan as join types, not subquery re-execution") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("dedup candidate generation shuffles on band keys, not row data") {
    // the minhash pipeline's only wide exchanges are on (band, key) and the
    // id-pair join — the shingle arrays never shuffle with the full rows
    val df = graft.operators.Dedup.minhashNearDups(
      Tables.load(spark, dir, "documents"), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Exchange"), "banding is a shuffle by design")
  }

  test("partition pruning reaches the scan for partitioned tables") {
    val t = "plan_part"
    Warehouse.dropTable(spark, t)
    Warehouse.createTable(
      Tables.load(spark, dir, "orders").withColumn("yr", year(col("o_orderdate"))),
      t, partitionBy = Seq("yr"))
    val p = spark.table(t).filter(col("yr") === 1997)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(yr"), s"pruning missing:\n$p")
    Warehouse.dropTable(spark, t)
  }
}
