package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** NATIVE as-of join — the whole-operator custom stack (logical node →
  * planner strategy → physical exec) for the one time-series operator
  * Spark lacks. [[graft.ops.AsOfJoin]] is the composed baseline
  * (range join + row_number window); its weakness at depth is
  * structural: the range join MATERIALIZES every (left row × earlier
  * right row) candidate — per-key-history fan-out — then the window
  * sorts those candidates to keep rank 1. This operator is the merge
  * form: both sides hash-cluster on key and sort by (key, time) —
  * exchanges and sorts Spark inserts from the declared requirements,
  * so AQE still owns them — and ONE forward pass per partition emits
  * each left row with the right row of greatest rightTime ≤ leftTime.
  * No candidate blow-up, no window, state = one buffered right row.
  *
  * Contract (v1, kept deliberately narrow):
  *  - key and time expressions must be LongType (callers pre-project
  *    `unix_micros(ts)` etc. — exactness discipline anyway);
  *  - right side deduped per (key, time) for determinism (ties at the
  *    same time take the LAST row in sort order — same rule as the
  *    composed form after its dedupe);
  *  - LEFT OUTER semantics: unmatched left rows carry nulls.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // key-clustered children + (key, time) sort: EnsureRequirements
  // inserts the exchanges/sorts, so AQE coalescing/skew handling and
  // exchange reuse all apply to this operator like any built-in join.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    val rWidth = rSchema.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lSchema)
      val rProj = UnsafeProjection.create(rKeyExprs, rSchema)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      new Iterator[InternalRow] {
        private var matchKey = 0L
        private var haveMatch = false
        private var lastMatch: InternalRow = _
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lkt = lProj(l)
          if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
            joined(l, nullRight)
          } else {
            val lk = lkt.getLong(0)
            val lt = lkt.getLong(1)
            // advance the right side to the last row with
            // rKey < lk, or rKey == lk && rTime <= lt
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rkt = rProj(rBuf.head)
              if (rkt.isNullAt(0) || rkt.isNullAt(1)) { rBuf.next(): Unit }
              else {
                val rk = rkt.getLong(0)
                val rt = rkt.getLong(1)
                if (rk < lk) { rBuf.next(): Unit } // behind: discard
                else if (rk == lk && rt <= lt) {
                  // candidate: remember a COPY (unsafe rows reuse buffers)
                  lastMatch = rBuf.next().copy()
                  matchKey = lk
                  haveMatch = true
                } else advancing = false // ahead: stop
              }
            }
            if (haveMatch && matchKey == lk) joined(l, lastMatch)
            else joined(l, nullRight)
          }
        }
      }
    }
  }
}

/** DataFrame-facing entry point. */
object AsOfJoinNative {
  /** All four expressions must be LongType columns RESOLVED against
    * their own side (pre-project `unix_micros(ts)` into a column
    * first). Output = left columns ++ right columns (nullable).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column): DataFrame = {
    val spark: SparkSession = left.sparkSession
    val exprs = Seq(leftKey, rightKey, leftTime, rightTime)
      .map(GraftColumnBridge.expression)
    exprs.foreach { e =>
      require(e.resolved, s"as-of expression must be resolved: $e")
      require(e.dataType == LongType,
        s"as-of key/time must be LongType, got ${e.dataType} in $e")
    }
    val Seq(lk, rk, lt, rt) = exprs
    GraftPlanBridge.ofRows(spark,
      AsOfJoinNode(GraftPlanBridge.analyzed(left),
        GraftPlanBridge.analyzed(right), lk, rk, lt, rt))
  }
}
