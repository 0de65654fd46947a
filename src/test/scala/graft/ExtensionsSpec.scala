package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorFunctions

class ExtensionsSpec extends SparkSpec {

  test("graft_cosine is callable from SQL after registration") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(got - 0.6) < 1e-7)
  }

  test("graft_cosine rejects non-array<float> arguments at analysis time") {
    VectorFunctions.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      // array<double> literals (no FLOAT cast) — must fail analysis with
      // a readable message, not ClassCastException at eval
      spark.sql("SELECT graft_cosine(array(1.0, 0.0), array(0.6, 0.8))").collect()
    }
    assert(err.getMessage.contains("graft_cosine"))
  }

  test("graft_repeat_stats is callable from SQL with and without the n-gram arg") {
    graft.functions.TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_repeat_stats(array('a','b','a','a'))").collect()(0).getStruct(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L) // top run 'a'×3, dup mass 3
    val bg = spark.sql(
      "SELECT graft_repeat_stats(array('a','b','a','b','a'), 2)").collect()(0).getStruct(0)
    // bigrams: (a b), (b a), (a b), (b a) → top 2, all 4 duplicated
    assert(bg.getLong(0) == 2L && bg.getLong(1) == 4L)
  }

  test("graft_ngrams is callable from SQL") {
    graft.functions.TextExpressions.registerNgrams(spark)
    val r = spark.sql("SELECT graft_ngrams(array('a','b','c'), 2)")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("a b", "b c"))
  }

  test("GraftExtensions injects graft_cosine into a session extensions set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder registered
    // the injected builder constructs the expression
    val expr = graft.functions.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 0.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.6f, 0.8f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(math.abs(expr.eval(null).asInstanceOf[Double] - 0.6) < 1e-7)
  }
}
