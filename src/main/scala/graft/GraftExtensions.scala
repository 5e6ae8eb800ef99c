package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductF

/** Session extension wiring: registers the engine's native expressions for
  * SQL use. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  *   SELECT dot_product_f(embedding, embedding) FROM embeddings
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      GraftExtensions.dotBuilder))
  }
}

object GraftExtensions {
  private[graft] val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProductF(a, b)
    case children => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> "`dot_product_f`", "expectedNum" -> "2",
        "actualNum" -> children.length.toString, "docroot" -> ""))
  }

  /** Register the engine's SQL functions on an already-running session
    * (withExtensions only takes effect at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge
      .registerFunction(spark, "dot_product_f", dotBuilder)
}
