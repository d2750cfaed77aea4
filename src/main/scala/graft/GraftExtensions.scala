package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.functions.{NormCdf, NormPpf}

/** SparkSessionExtensions hook: registers the engine's custom scalar
  * functions in the SQL function registry, so `spark.sql("norm_cdf(x)")`
  * works alongside the Column API in [[graft.functions.normal]].
  *
  * Usage: `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("norm_cdf"),
      new ExpressionInfo(classOf[NormCdf].getName, "norm_cdf"),
      (children: Seq[Expression]) => NormCdf(Cast(children.head, DoubleType))))
    ext.injectFunction((
      new FunctionIdentifier("norm_ppf"),
      new ExpressionInfo(classOf[NormPpf].getName, "norm_ppf"),
      (children: Seq[Expression]) => NormPpf(Cast(children.head, DoubleType))))
  }
}
