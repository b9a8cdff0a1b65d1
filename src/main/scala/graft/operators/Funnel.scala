package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (the MATCH_RECOGNIZE-lite shape): for each
  * user, how far did they progress through a stage sequence, where stage
  * i+1 only counts if it happens strictly after the user's earliest
  * completion of stage i.
  *
  * Scale shape: one user-keyed join + min-aggregate per stage — no
  * per-user window over the full event stream (the naive sort-per-user
  * plan funnels every hot user's events through one task), no
  * driver-side state. Stage tables shrink monotonically (only users who
  * reached stage i are joined for stage i+1), so later stages get
  * cheaper.
  */
object Funnel {

  /** Returns (userCol, stage): 0 = never hit stages.head, k = completed
    * all k stages in order. */
  def stageReached(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame =
    stageImpl(df, userCol, tsCol, typeCol, stages, None)

  /** `stageReached` with a conversion window: stage i+1 only counts if
    * it happens strictly after the earliest completion of stage i AND
    * within `maxGapSeconds` of it — the "converted within an hour"
    * funnel. Same one-join-plus-min-agg-per-stage scale shape. */
  def stageReachedWithin(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds > 0, "maxGapSeconds must be positive")
    stageImpl(df, userCol, tsCol, typeCol, stages, Some(maxGapSeconds))
  }

  private def stageImpl(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapSeconds: Option[Long]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val users = df.select(col(userCol).as("user")).distinct()
    var cur: DataFrame = null
    val stageTimes = stages.zipWithIndex.map { case (st, i) =>
      val evs = df.filter(col(typeCol) === st)
        .select(col(userCol).as("user"), col(tsCol).as("ts"))
      val eligible =
        if (cur == null) evs
        else {
          val within = maxGapSeconds.map(g =>
            col("ts") <= col(s"t$i") + expr(s"INTERVAL $g SECONDS"))
            .getOrElse(lit(true))
          evs.join(cur, "user").filter(col("ts") > col(s"t$i") && within)
            .select(col("user"), col("ts"))
        }
      cur = eligible.groupBy("user").agg(min("ts").as(s"t${i + 1}"))
      cur
    }
    val joined = stageTimes.foldLeft(users)(
      (acc, st) => acc.join(st, Seq("user"), "left"))
    // ascending fold leaves the DEEPEST stage as the outermost branch:
    // when(t_k, k).otherwise(... when(t_1, 1).otherwise(0))
    val stage = stages.indices.foldLeft(lit(0)) {
      (els, i) => when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(els)
    }
    joined.select(col("user").as(userCol), stage.as("stage"))
  }

  /** Event-transition (first-order Markov) counts: for each user's
    * event stream in (ts, tie-break id) order, count every consecutive
    * (from_type → to_type) pair — the behavioral transition matrix
    * behind "what do users do after X" analyses. The tie-break column
    * makes same-timestamp ordering deterministic (and SQL-replayable);
    * each user's first event has no predecessor and emits nothing.
    *
    * Scale shape: one user-keyed window (each partition is one user's
    * events) + a combinable count aggregate over |types|² groups. */
  def transitionCounts(
      df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    df.select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Weekly cohort retention: users are cohorted by the Monday of their
    * first qualifying event, and each (cohort_week, week_offset) cell
    * counts how many of them were active `week_offset` weeks later.
    * Pre-filter `df` to the qualifying activity (event type, value
    * threshold) before calling.
    *
    * Scale shape: the event stream collapses to distinct (user, week)
    * FIRST — a map-side-combinable aggregate that shrinks the data to
    * |users| × |weeks| before anything else — then one user-keyed join
    * against the min-week cohort table (both sides already hashed on
    * user) and a small final aggregate. No per-user window over raw
    * events. Offsets are exact integer arithmetic on Monday-truncated
    * dates (both engines truncate weeks to Monday), never float date
    * math.
    *
    * Contract: rows with a NULL user OR a NULL timestamp are dropped —
    * neither can be cohorted. An oracle replay must filter both. */
  def cohortRetention(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = df.select(col(userCol).as("user"),
        date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .filter(col("user").isNotNull && col("wk").isNotNull)
      .distinct()
    val cohort = uw.groupBy("user").agg(min("wk").as("cohort_week"))
    uw.join(cohort, "user")
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(countDistinct("user").as("n_users"))
  }
}
