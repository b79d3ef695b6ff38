package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point — activates with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Injects the engine's native SQL functions (currently `listagg`,
  * SURVEY §2.11(b)) into the session's FunctionRegistry so the S2/S5
  * SQL-text surface can call them like built-ins. No custom Rule or
  * Strategy is registered — SURVEY §4's conclusion that the reference
  * surface needs none stands; this class is the seam where one would
  * go.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("listagg"),
      new ExpressionInfo(classOf[ListAgg].getName, "listagg"),
      ListAgg.builder _))
  }
}
