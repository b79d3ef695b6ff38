package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point — activates with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Injects the engine's native SQL functions (currently `listagg`,
  * SURVEY §2.11(b)) into the session's FunctionRegistry so the S2/S5
  * SQL-text surface can call them like built-ins, plus ONE optimizer
  * rule: [[TokenIndexSubstitution]], the index-aware scan rewrite
  * (inert until an index is registered in [[IndexCatalog]]). The
  * REFERENCE surface needs no custom Rule (SURVEY §4's conclusion
  * stands); the rule serves the beyond-reference index tier
  * (q40/TokenStore) where substituting a posting lookup for a corpus
  * scan is the entire point of maintaining the index.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => TokenIndexSubstitution(session))
    ext.injectOptimizerRule(session => TierStatsRule(session))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("listagg"),
      new ExpressionInfo(classOf[ListAgg].getName, "listagg"),
      ListAgg.builder _))
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "long_array_dot(a, b) expects 2 arguments")
        LongArrayDot(args(0), args(1))
      }))
  }
}
