package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the most recent right row
  * with `rightTs <= leftTs` for the same key (time-series state lookup —
  * events against slowly-changing dimensions, trades against quotes).
  *
  * Spark has no AsOf node (Hive 1.2 has none either); the naive
  * expression is a non-equi range join that Catalyst can only plan as a
  * broadcast nested loop or a per-key sort in a cartesian. This is the
  * union-tag re-expression: tag both sides, one shuffle on the key,
  * one sort by (ts, tag), and a running `last(value, ignoreNulls)`
  * window carries each dim value forward to the fact rows that follow
  * it. Cost at 100 TB = exactly one hash shuffle of both inputs plus a
  * per-partition sort — the same price as an equi sort-merge join, with
  * no range explosion and AQE-managed partitioning.
  *
  * Ties (`rightTs == leftTs`) are inclusive: the dim row sorts before
  * the fact row at equal timestamps, matching ASOF `>=` semantics.
  */
object AsOfJoin {

  /** Left as-of join. `payload` = right-side columns to carry; left
    * columns pass through unchanged. Rows with no earlier right match
    * keep NULL payloads (left-outer semantics). Right rows sharing
    * (key, ts) are tie-broken by the last payload in `tieBreak` order
    * if given, else input order is required to be unique per (key, ts).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("__asof_ts", "__asof_tag", "__asof_tie", "__asof_state")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      "input uses a reserved __asof_* column name")
    require(payload.intersect(leftCols.filterNot(on.contains)).isEmpty,
      "payload names collide with left columns — rename one side")

    // ASOF's key equality and `leftTs >= rightTs` never match a NULL key
    // or NULL rightTs; drop those right rows up front (ascending sort
    // puts NULLs first, so they would otherwise precede every fact and
    // leak state). Facts with NULL keys/ts then see an empty state
    // stream and keep NULL payloads — left-outer semantics.
    val matchableRight = right.filter(
      on.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)

    // Payload travels as ONE struct column: a fact row's state is NULL
    // (no struct), while a dim row whose payload values are legitimately
    // NULL still carries a non-null struct — so `last(ignoreNulls)`
    // never leaks an older value over a real NULL state.
    val taggedRight = matchableRight.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__asof_ts"), lit(0).as("__asof_tag"),
        tieBreak.getOrElse(lit(0L)).as("__asof_tie"),
        struct(payload.map(col): _*).as("__asof_state")): _*)
    val taggedLeft = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__asof_ts"), lit(1).as("__asof_tag"),
        lit(0L).as("__asof_tie")) ++
        leftCols.filterNot(on.contains).map(c => col(c).as(s"__l_$c")): _*)

    // unionByName pads each side's missing columns with NULL
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_tag"), col("__asof_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof_state",
        last(col("__asof_state"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
      .select(on.map(col) ++
        leftCols.filterNot(on.contains).map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__asof_state.$c").as(c)): _*)
  }
}
