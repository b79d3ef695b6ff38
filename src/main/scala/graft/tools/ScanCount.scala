package graft.tools

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Scan-repetition audit (round-7 verdict #7): how many times does one
  * query's EXECUTED plan scan each input, and does any iterative query
  * re-scan a round's lineage?
  *
  * An unrolled iterative plan that loses its cache (or caches the
  * wrong frame) recomputes upstream lineage per round — the 2^rounds
  * blow-up g5 hit in round 6. The executed-plan scan count is the
  * ground truth for that failure mode: every recompute shows up as an
  * extra `FileSourceScan` of the same path. The walker descends
  * adaptive roots, materialized query stages, AND cached-relation
  * plans (a persisted frame's build scans live under
  * `InMemoryTableScan.cachedPlan`, counted once per distinct cache —
  * re-reads of the cache itself are free and don't count).
  *
  * `GraphScanAuditSpec` pins per-query bounds for the whole g-family;
  * the main prints the table PLANS.md records.
  */
object ScanCount {

  /** Walk the executed plan, descending AQE wrappers and each distinct
    * cached plan once (QueryMetrics' traversal discipline). */
  private def allNodes(p: SparkPlan): Iterator[SparkPlan] = {
    val seenCached = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Iterator[SparkPlan] =
      Iterator(p) ++ (p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: QueryStageExec        => go(q.plan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          if (seenCached.add(m.relation.cachedPlan)) go(m.relation.cachedPlan)
          else Iterator.empty
        case other => other.children.iterator.flatMap(go)
      })
    go(p)
  }

  /** Run one registry query to the noop sink and return its executed
    * plan's file-scan counts, keyed by the scanned directory/file name
    * (e.g. "lineitem.parquet", "purchase"). */
  def counts(spark: SparkSession, dir: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Map[String, Int] = {
    // Constructing the frame first lets any store-materialization side
    // effects (GraphStore builds fire their own write actions) happen
    // OFF the capture — otherwise the first listener event is the
    // build's plan, not the query's.
    fn(spark, dir): Unit
    val captured = new AtomicReference[QueryExecution]()
    val listener = new QueryExecutionListener {
      // keep the LAST delivered event: the bus is FIFO and our noop
      // write is the last action started, so once delivery quiesces
      // the final event IS the audited query — a build-internal
      // execution still queued from the warm construction can no
      // longer masquerade as the query's plan (it did: the round-9
      // audit of a stale-tier query captured the build's sampling
      // pass and under-counted the real scans)
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        captured.set(qe)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    // register on the FRAME's session, not the caller's: a query may
    // build its plan on a child session (q85 scopes its recursion
    // limit to s.newSession()), and a parent-session listener never
    // sees a child session's executions — ScaleProbe.shuffleBytesOf's
    // discipline
    val frame = fn(spark, dir)
    val sess = frame.sparkSession
    sess.listenerManager.register(listener)
    try {
      frame.write.format("noop").mode("overwrite").save()
      // listener fires asynchronously on the listener bus: wait for
      // at least one event, then for delivery to go quiet
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (captured.get() == null && System.nanoTime() < deadline) Thread.sleep(20)
      var last = captured.get()
      require(last != null, "listener never fired")
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 300L * 1000 * 1000 &&
             System.nanoTime() < deadline) {
        Thread.sleep(20)
        val now = captured.get()
        if (!(now eq last)) { last = now; stableSince = System.nanoTime() }
      }
      val qe = last
      allNodes(qe.executedPlan)
        .collect { case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map { p =>
            // DerivedStore/AtomicPublish tiers read versioned subdirs
            // (…/purchase/v=3): report the tier name, not the version
            val n = p.getName
            if (n.matches("v=?\\d+")) p.getParent.getName else n
          }.toSeq
        }
        .flatten.toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    } finally {
      sess.listenerManager.unregister(listener)
      graft.core.Caching.releaseAll()
      spark.catalog.clearCache()
    }
  }

  /** Print per-query scan counts: `ScanCount <sfDir> [names...]`
    * (defaults to the g-family). */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, rest @ _*) = args
    val names =
      if (rest.nonEmpty) rest
      else graft.SparkEntry.queries.keys.filter(_.startsWith("g")).toSeq.sorted
    val spark = graft.core.Sessions.local()
    for (n <- names.sorted) {
      val c = counts(spark, sfDir, graft.SparkEntry.queries(n))
      println(f"$n%-22s ${c.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    }
    spark.stop()
  }
}
