package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.CosineSim

/** Library-style registration: inject graft's custom expressions into any
  * session via config — no code changes in the host application:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically: `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * After injection, `graft_cosine(a, b)` is available in SQL and via
  * `call_function` — same expression `VectorFunctions.register` installs
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
  }
}
