package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductFloat, L2SquaredFloat}

/** SparkSessionExtensions entry point: registers graft's native
  * functions on every session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` — the supported way to
  * ship engine extensions to a cluster without touching user code.
  *
  * Currently: `dot_f32` and `l2sq_f32`
  * (`(array<float>, array<float>) → double` — codegen'd dot product and
  * squared Euclidean distance, the embedding-similarity hot paths).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f32"),
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("l2sq_f32"),
      new ExpressionInfo(classOf[L2SquaredFloat].getName, "l2sq_f32"),
      (children: Seq[Expression]) => L2SquaredFloat(children(0), children(1))))
  }
}
