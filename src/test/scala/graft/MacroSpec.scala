package graft

import graft.functions.Macros

/** CREATE/DROP TEMPORARY MACRO semantics (ref:
  * ql/parse/MacroSemanticAnalyzer.java — duplicate-parameter and
  * non-parameter-column rejection; typed parameters; temporary scope). */
class MacroSpec extends SparkSpec {

  test("macro expands to the inline expression") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x))")
    val v = spark.sql("SELECT sigmoid(0.0)").collect().head.getDouble(0)
    assert(v == 0.5)
  }

  test("macro arguments are cast to the declared parameter types") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO half_int(x INT) x div 2")
    // '7' (string) → cast to INT per the signature, then integer div
    // (Spark's div always yields LONG)
    assert(spark.sql("SELECT half_int('7')").collect().head.getLong(0) == 3L)
  }

  test("parameter references are case-insensitive") {
    Macros.create(spark, "twice", Seq("Val" -> "bigint"), "VAL + val")
    assert(spark.sql("SELECT twice(21)").collect().head.getLong(0) == 42L)
  }

  test("macros compose: a macro body may call another macro") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO area(r DOUBLE) r * r * pi()")
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO ring(ro DOUBLE, ri DOUBLE) area(ro) - area(ri)")
    val v = spark.sql("SELECT round(ring(2.0, 1.0) / pi(), 6)")
      .collect().head.getDouble(0)
    assert(v == 3.0)
  }

  test("zero-argument macro") {
    Macros.sql(spark, "CREATE TEMPORARY MACRO the_answer() 42")
    assert(spark.sql("SELECT the_answer()").collect().head.getInt(0) == 42)
  }

  test("duplicate parameter names are rejected") {
    val e = intercept[IllegalArgumentException] {
      Macros.create(spark, "dup", Seq("a" -> "int", "A" -> "int"), "a + 1")
    }
    assert(e.getMessage.contains("duplicate parameter"))
  }

  test("body referencing a non-parameter column is rejected") {
    val e = intercept[IllegalArgumentException] {
      Macros.create(spark, "leaky", Seq("a" -> "int"), "a + l_quantity")
    }
    assert(e.getMessage.contains("non-parameter"))
  }

  test("wrong arity fails at call site") {
    Macros.sql(spark, "CREATE TEMPORARY MACRO unary(x INT) x + 1")
    val e = intercept[Exception] {
      spark.sql("SELECT unary(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("argument"))
  }

  test("DROP TEMPORARY MACRO removes the definition") {
    Macros.sql(spark, "CREATE TEMPORARY MACRO ephemeral(x INT) x")
    assert(spark.sql("SELECT ephemeral(5)").collect().head.getInt(0) == 5)
    Macros.sql(spark, "DROP TEMPORARY MACRO ephemeral")
    intercept[Exception] { spark.sql("SELECT ephemeral(5)").collect() }
  }

  test("macro stays codegen-compatible: no ScalaUDF in the plan") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO gross(p DOUBLE, t DOUBLE) p * (1.0 + t)")
    import spark.implicits._
    val df = Seq((100.0, 0.1), (200.0, 0.2)).toDF("p", "t")
      .selectExpr("gross(p, t) AS g")
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(df.collect().map(_.getDouble(0)).sorted.sameElements(
      Array(110.00000000000001, 240.0)))
  }
}
