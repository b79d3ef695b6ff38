package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.core.Sessions

/** Attribute a query's JOB COUNT, job by job: run one registry query
  * (warm-construct pass first, QueryCost's rule) and print every job
  * the timed run submits — its id, stage count, task count, and the
  * callsite / description Spark recorded. The per-job view is what
  * QueryCost's totals can't show: WHICH materialization (cache fill,
  * broadcast build, AQE stage, final stage) each job is, i.e. where a
  * 30-job query actually spends its driver round-trips.
  *
  * Usage: `run_class.sh graft.tools.JobTrace <sfDir> <name>...`
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = Sessions.local(cores = 32, appName = "graft-jobtrace")
    spark.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, stageIds: Seq[Int], nTasks: Int)
    val seen = new ConcurrentLinkedQueue[J]()
    // stages that actually RAN (completed with tasks); a job's
    // submitted-stage list includes ancestors Spark skips as
    // already-computed, so executed = submitted ∩ completed-here
    val ran = new ConcurrentLinkedQueue[(Int, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        seen.add(J(j.jobId, j.stageInfos.map(_.stageId),
          j.stageInfos.map(_.numTasks).sum)): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        ran.add((s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n').take(70),
          s.stageInfo.numTasks)): Unit
    })

    def release(): Unit = {
      graft.core.Caching.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }
    for (n <- names) {
      val fn = graft.queries.Registry.queries(n)
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      run(); release() // warm: tier builds + codegen off the trace
      seen.clear(); ran.clear()
      run()
      Thread.sleep(500)
      val ranMap = {
        val m = collection.mutable.Map[Int, (String, Int)]()
        ran.forEach(r => m(r._1) = (r._2, r._3))
        m
      }
      println(s"== $n: ${seen.size} jobs, ${ranMap.size} executed stages ==")
      seen.forEach { j =>
        val executed = j.stageIds.filter(ranMap.contains)
        val names = executed.map(id => s"$id:${ranMap(id)._1}(${ranMap(id)._2}t)")
        println(f"  job ${j.id}%3d  ran ${executed.size}%2d/${j.stageIds.size}%2d stages  ${names.mkString(" | ").take(180)}")
      }
      release()
    }
    spark.stop()
  }
}
