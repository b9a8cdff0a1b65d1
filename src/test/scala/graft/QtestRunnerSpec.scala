package graft

import graft.qtest.QtestRunner

/** Runner-level fidelity pins that the script gates alone can't
  * localize: the compute_stats numBitVectors cap (VERDICT r09 #1 — the
  * rewrite that unlocked compute_stats_* positives must still reject
  * like GenericUDAFComputeStats), and the engine-side EXPORT/IMPORT
  * URI-scheme rejection (VERDICT r09 #2 — a fake scheme must fail, not
  * materialize as a literal relative directory). */
class QtestRunnerSpec extends SparkSpec {

  private val refRoot = sys.env.getOrElse("GRAFT_REF_ROOT", "/root/reference")

  test("compute_stats rewrite enforces Hive's numBitVectors <= 1024 cap") {
    assume(new java.io.File(refRoot).isDirectory,
      s"reference checkout not present at $refRoot")
    val runner = new QtestRunner(spark, refRoot)
    val e = intercept[IllegalArgumentException] {
      runner.execute("select compute_stats(a, 10000) from cs_cap_t")
    }
    assert(e.getMessage.contains("1024"), e.getMessage)
    // exactly at the cap the rewrite proceeds (no cap exception; the
    // unresolved fixture table is the only failure left)
    val e2 = intercept[Exception] {
      runner.execute("select compute_stats(a, 1024) from cs_cap_t")
    }
    assert(!e2.getMessage.contains("bit vectors"), e2.getMessage)
  }

  test("EXPORT to a non-file URI scheme is rejected, not created") {
    spark.sql("DROP TABLE IF EXISTS exim_scheme_t")
    spark.sql("CREATE TABLE exim_scheme_t USING parquet AS SELECT 1 AS a")
    try {
      val e = intercept[IllegalArgumentException] {
        Warehouse.exportTable(spark, "exim_scheme_t",
          "nosuchschema://nosuchauthority/test/exports/t")
      }
      assert(e.getMessage.contains("No FileSystem for scheme"), e.getMessage)
      assert(!new java.io.File("nosuchschema:").exists(),
        "fake-URI export must not create a literal relative directory")
    } finally spark.sql("DROP TABLE IF EXISTS exim_scheme_t")
  }
}
