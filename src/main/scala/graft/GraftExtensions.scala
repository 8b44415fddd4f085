package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, RollingFingerprint}

/** Engine extension point: registers graft's native Catalyst expressions so
  * they are callable from SQL / `expr(...)` in any session built with
  * `.withExtensions(new GraftExtensions)` (or via
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_prod"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_prod"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_prod(a, b) takes two arrays")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fp"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_fp(text) takes one string")
        RollingFingerprint(children.head)
      }))
  }
}
