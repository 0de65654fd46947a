package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Library-style registration: inject graft's custom expressions into any
  * session via config — no code changes in the host application:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically: `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * After injection the full native-function surface is available in SQL
  * and via `call_function` — the same expressions the imperative
  * `VectorFunctions.register` / `TextExpressions.register*` calls
  * install: `graft_cosine(a, b)`, `graft_quantize_vec(v)`,
  * `graft_dequantize_vec(q, s)`, `graft_sign_bits(v, planes)`,
  * `graft_repeat_stats(arr[, n])`, `graft_ngrams(arr, n)`,
  * `graft_window_hashes(arr, w)`, `graft_grid_segments(arr, w)`,
  * `graft_remove_spans(toks, starts, w)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(ext: SparkSessionExtensions, name: String,
      clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "graft_cosine", classOf[CosineSim],
      e => CosineSim(e(0), e(1)))
    inject(ext, "graft_quantize_vec", classOf[QuantizeVec],
      e => QuantizeVec(e(0)))
    inject(ext, "graft_dequantize_vec", classOf[DequantizeVec],
      e => DequantizeVec(e(0), e(1)))
    inject(ext, "graft_sign_bits", classOf[SignBits],
      e => SignBits(e(0), e(1)))
    inject(ext, "graft_repeat_stats", classOf[RepeatStats],
      e => RepeatStats(e(0), if (e.length > 1) e(1) else Literal(1)))
    inject(ext, "graft_ngrams", classOf[Ngrams],
      e => Ngrams(e(0), e(1)))
    inject(ext, "graft_window_hashes", classOf[WindowHashes],
      e => WindowHashes(e(0), e(1)))
    inject(ext, "graft_grid_segments", classOf[GridSegments],
      e => GridSegments(e(0), e(1)))
    inject(ext, "graft_remove_spans", classOf[RemoveSpans],
      e => RemoveSpans(e(0), e(1), e(2)))
  }
}
