package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.core.Sessions

/** Per-query cost profile at ONE scale factor: wall seconds, shuffle
  * bytes, and the job/stage/task counts behind them — the numbers that
  * separate "data-bound" from "stage-count-bound" when the host is too
  * noisy for wall-clock alone (each stage is a fixed scheduling +
  * barrier overhead locally AND a cluster round-trip at scale).
  *
  * Usage: `run_class.sh graft.tools.QueryCost <sfDir> [names...]`
  * (defaults to the full registry, sorted). One warm-construct pass
  * keeps tier builds and codegen off the numbers (ScanCount's rule);
  * the profiled run is cold-cache (Caching.releaseAll between runs).
  */
object QueryCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.queries.Registry.queries.keys.toSeq.sorted
    val spark = Sessions.local(cores = 32, appName = "graft-querycost")
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)

    def release(): Unit = {
      // blocking: async block drops would bleed into the next query's
      // timed run (the g9-after-g8 suite-order inflation, r15)
      graft.core.Caching.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }

    println(f"${"query"}%-28s ${"sec"}%8s ${"shufMB"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    for (n <- names) {
      val fn = graft.queries.Registry.queries(n)
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        run(); release() // warm: tier builds + codegen off the profile
        jobs.set(0); stages.set(0); tasks.set(0)
        // timed run first (no listener settle-loop inside the clock)
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle until the
        // counters go quiescent (ScaleProbe's discipline — a fixed
        // sleep under-counts on a loaded host), then snapshot
        val settleDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = (-1, -1, -1)
        while ({
          val now = (jobs.get, stages.get, tasks.get)
          val settling = now != last
          last = now
          settling && System.nanoTime() < settleDeadline
        }) Thread.sleep(200)
        val (nj, ns, nt) = (jobs.get, stages.get, tasks.get)
        release()
        // byte-profiled run second (separate run: the byte listener's
        // settle loop must stay off the timed run's clock)
        val bytes = ScaleProbe.shuffleBytesOf(fn(spark, sfDir))
        println(f"$n%-28s $sec%8.3f ${bytes / 1e6}%8.2f $nj%5d $ns%7d $nt%6d")
      } catch {
        case e: Throwable =>
          println(s"$n FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      release()
    }
    spark.stop()
  }
}
