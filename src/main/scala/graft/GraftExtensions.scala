package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSim, Ngrams, RepeatStats}

/** Library-style registration: inject graft's custom expressions into any
  * session via config — no code changes in the host application:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically: `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * After injection, `graft_cosine(a, b)` and `graft_repeat_stats(arr[, n])`
  * are available in SQL and via `call_function` — the same expressions
  * `VectorFunctions.register` / `TextExpressions.register` install
  * imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_repeat_stats"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RepeatStats].getName, "graft_repeat_stats"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RepeatStats(exprs(0),
          if (exprs.length > 1) exprs(1)
          else org.apache.spark.sql.catalyst.expressions.Literal(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Ngrams].getName, "graft_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Ngrams(exprs(0), exprs(1))))
  }
}
