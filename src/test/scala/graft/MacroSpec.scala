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

  test("a multi-occurrence parameter evaluates its argument once (Hive semantics)") {
    // Hive's GenericUDFMacro receives evaluated argument values, so
    // pair(uuid()) must repeat ONE draw, not draw twice
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO pair(x STRING) array(x, x)")
    val arr = spark.sql("SELECT pair(uuid())").collect().head.getSeq[String](0)
    assert(arr.length == 2 && arr(0) == arr(1),
      s"argument evaluated twice: $arr")
  }

  test("parameterized types parse through the SQL front door") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO cents(p DECIMAL(12,2), q DECIMAL(12,2)) p + q")
    val v = spark.sql("SELECT cents(1.25, 2.50)").collect().head.getDecimal(0)
    assert(v.toString == "3.75")
  }

  test("complex types with commas in angle brackets parse through the SQL front door") {
    Macros.sql(spark,
      "CREATE TEMPORARY MACRO pick(m MAP<STRING,INT>, s STRUCT<a:INT,b:STRING>) " +
        "m['k'] + s.a")
    val v = spark.sql(
      "SELECT pick(map('k', 40), named_struct('a', 2, 'b', 'x'))")
      .collect().head.getInt(0)
    assert(v == 42)
  }

  test("qualified column references in the body are rejected") {
    val e = intercept[IllegalArgumentException] {
      Macros.create(spark, "leaky2", Seq("a" -> "int"), "a + lineitem.l_quantity")
    }
    assert(e.getMessage.contains("non-parameter"))
  }

  test("DROP without IF EXISTS errors on a missing macro; IF EXISTS is silent") {
    intercept[IllegalArgumentException] {
      Macros.sql(spark, "DROP TEMPORARY MACRO never_created")
    }
    Macros.sql(spark, "DROP TEMPORARY MACRO IF EXISTS never_created") // no-op
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
