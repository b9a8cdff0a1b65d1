package graft

import graft.operators.Lines
import org.apache.spark.sql.functions._

/** Cross-document line-level boilerplate removal. */
class LinesSpec extends SparkSpec {
  import spark.implicits._

  test("lines shared by >= minDocFreq docs are stripped, order preserved") {
    val bp = "all rights reserved"
    val docs = Seq(
      (1L, s"alpha one\n$bp\nbeta two"),
      (2L, s"$bp\ngamma three"),
      (3L, s"delta four\n$bp"),
      (4L, "epsilon five")).toDF("id", "text")
    val out = Lines.stripBoilerplate(docs, "id",
        split(col("text"), "\n"), minDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha one\nbeta two", 2L, 1L)))
    assert(out(2L) == (("gamma three", 1L, 1L)))
    assert(out(3L) == (("delta four", 1L, 1L)))
    assert(out(4L) == (("epsilon five", 1L, 0L)))
  }

  test("a document that is pure boilerplate comes back empty, not missing") {
    val bp = "subscribe now"
    val docs = Seq((1L, bp), (2L, bp), (3L, s"real content\n$bp"))
      .toDF("id", "text")
    val out = Lines.stripBoilerplate(docs, "id",
        split(col("text"), "\n"), minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 3) // every doc present
    assert(out(1L) == (("", 0L)))
    assert(out(3L) == (("real content", 1L)))
  }

  test("pseudoLines groups tokens in fixed widths; NULL/blank text yields none") {
    val docs = Seq((1L, "a b c d e f g"), (2L, " "),
        (3L, null.asInstanceOf[String])).toDF("id", "text")
    val rows = docs.select(col("id"),
        Lines.pseudoLines(col("text"), 3).as("l"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a b c", "d e f", "g"))
    assert(rows(2L).isEmpty && rows(3L).isEmpty)
  }

  test("NULL-id rows pass through untouched and don't inflate doc frequency") {
    val bp = "all rights reserved"
    val docs = Seq(
      (java.lang.Long.valueOf(1L), s"alpha\n$bp"),
      (java.lang.Long.valueOf(2L), s"$bp\nbeta"),
      (null.asInstanceOf[java.lang.Long], s"$bp\nghost")).toDF("id", "text")
    // minDocFreq=3: only 2 non-null docs carry the line (NULL id is skipped
    // by countDistinct), so nothing is stripped anywhere.
    val out = Lines.stripBoilerplate(docs, "id",
        split(col("text"), "\n"), minDocFreq = 3)
      .collect()
      .map(r => Option(r.get(0)) ->
        (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(Some(1L)) == ((s"alpha\n$bp", 2L, 0L)))
    assert(out(Some(2L)) == ((s"$bp\nbeta", 2L, 0L)))
    assert(out(None) == ((s"$bp\nghost", 2L, 0L)))
  }
}
