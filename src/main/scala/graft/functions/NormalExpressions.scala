package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the standard-normal CDF / inverse CDF —
  * the engine extension SURVEY.md §7.3 calls for (option (a): a codegen-able
  * `Expression`, not a Scala UDF). Each generates a single static call into
  * [[NormalMath]] inside whole-stage codegen, so IRB formula columns stay in
  * one generated loop with no iterator breaks or boxing.
  *
  * Reference counterpart: the `polars-normal-stats` native plugin
  * (`engine/irb/stats_backend.py:1-45`).
  */
abstract class NormalUnary extends UnaryExpression {
  override def dataType: DataType = DoubleType
  protected def fn: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE input, got ${child.dataType.sql}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalMath.$fn($c)")
}

/** Φ(x): standard normal CDF. */
case class NormCdf(child: Expression) extends NormalUnary {
  override protected def fn: String = "normCdf"
  override def prettyName: String = "norm_cdf"
  override protected def nullSafeEval(input: Any): Any =
    NormalMath.normCdf(input.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): NormCdf =
    copy(child = newChild)
}

/** Φ⁻¹(p): standard normal inverse CDF (quantile). */
case class NormPpf(child: Expression) extends NormalUnary {
  override protected def fn: String = "normPpf"
  override def prettyName: String = "norm_ppf"
  override protected def nullSafeEval(input: Any): Any =
    NormalMath.normPpf(input.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): NormPpf =
    copy(child = newChild)
}

/** Column-API entry points: `import graft.functions.normal._`. */
object normal {
  private def toDouble(c: Column): Expression = {
    val e = GraftBridge.expression(c)
    Cast(e, DoubleType)
  }
  def norm_cdf(c: Column): Column = GraftBridge.column(NormCdf(toDouble(c)))
  def norm_ppf(c: Column): Column = GraftBridge.column(NormPpf(toDouble(c)))
}
