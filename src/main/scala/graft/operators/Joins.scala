package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape helpers for skew beyond what AQE's runtime splitting can
  * reach (reference: SkewJoinHandler ql/exec/SkewJoinHandler.java:74 and
  * the compile-time hive.optimize.skewjoin plan split). AQE handles
  * skewed SHUFFLE partitions; explicit salting is the remaining tool
  * when a single join KEY is hot and the build side is too large to
  * broadcast — the standard 100 TB mitigation.
  */
object Joins {

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted into
    * `saltFactor` sub-keys and the dim side replicated once per salt —
    * a hot key's rows spread over `saltFactor` tasks instead of one.
    * Result is exactly `fact.join(dim, key)` (inner). The fact salt is
    * derived deterministically from a unique fact column so repeated
    * runs place rows identically.
    *
    * Cost model: dim is duplicated saltFactor× through the shuffle —
    * use for moderate dims with a hot fact key; broadcast tiny dims
    * instead (no shuffle at all).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      uniqueFactCol: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltCol = "_graft_salt"
    require(!fact.columns.contains(saltCol) && !dim.columns.contains(saltCol),
      s"inputs must not already have a $saltCol column")
    val salted = fact.withColumn(saltCol,
      pmod(xxhash64(col(uniqueFactCol)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Fuzzy (edit-distance) string join: candidates block on shared
    * 4-char prefix OR 4-char suffix, then verify with exact levenshtein
    * ≤ maxDist — the LSH candidate/verify pattern applied to strings
    * (never a quadratic cross join). Blocking recall: a single edit
    * leaves prefix4 or suffix4 intact whenever the string is ≥ 8 chars,
    * so recall is total there; shorter strings may miss mid-string
    * edits (documented trade-off — add more block keys if they matter).
    * Returns (left id, right id, dist). */
  def fuzzyJoin(
      left: DataFrame, lId: String, lCol: String,
      right: DataFrame, rId: String, rCol: String,
      maxDist: Int = 1): DataFrame = {
    def blocked(df: DataFrame, id: String, v: String, pfx: String) =
      df.select(col(id).as(s"${pfx}_id"), col(v).as(s"${pfx}_v"),
        explode(array(
          concat(lit("p:"), substring(col(v), 1, 4)),
          concat(lit("s:"), expr(s"right(`$v`, 4)")))).as("bk"))
    blocked(left, lId, lCol, "l").join(blocked(right, rId, rCol, "r"), "bk")
      .select("l_id", "l_v", "r_id", "r_v").distinct()
      .select(col("l_id"), col("r_id"),
        levenshtein(col("l_v"), col("r_v")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
