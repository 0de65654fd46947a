package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine similarity over `array<float>` embeddings.
  *
  * A codegen'd expression (not a Scala UDF): stays inside whole-stage
  * codegen, reads the float arrays directly from Tungsten format with no
  * boxing — the difference between viable and not on a 100 TB
  * brute-force similarity scan. Accumulates in double; returns 0.0 for
  * zero-norm inputs. Null array → null (standard binary-expression
  * semantics); null ELEMENTS are not expected (testdata has none).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is unavailable (AbstractDataType is private[sql]),
  // so the type contract is enforced directly: a non-array<float> argument
  // fails at ANALYSIS with a readable message, not at eval with a
  // ClassCastException deep inside a 100 TB job.
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  // every local gets a ctx.freshName: two CosineSim instances can land
  // in the SAME codegen function scope (e.g. scored twice in one
  // projection), and fixed names would collide — janino rejects the
  // class and the whole stage silently falls back to interpreted eval
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getFloat($i);
         |  double $y = $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Register `graft_cosine` in the session's function registry so it is
    * callable from both the Column API (via [[cosine]]) and SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_cosine",
        exprs => CosineSim(exprs(0), exprs(1)), "built-in")

  /** Codegen'd cosine similarity column (requires [[register]] first). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Pure-built-in fallback via higher-order functions — same math
    * (double accumulation, dot/sqrt(na*nb)), no custom expression.
    * Kept as a cross-check and for environments where registering
    * functions isn't possible. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, y => y.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / sqrt(na * nb))
  }
}
