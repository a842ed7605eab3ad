package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductFloat

/** SparkSessionExtensions entry point: registers graft's native
  * functions on every session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the supported way to
  * ship engine extensions to a cluster without touching user code.
  *
  * Currently: `dot_f32(array<float>, array<float>) → double`
  * (codegen'd dot product, the embedding-similarity hot path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f32"),
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1))))
  }
}
