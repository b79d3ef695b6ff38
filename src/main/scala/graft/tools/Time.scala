package graft.tools

import org.apache.spark.sql.SparkSession

/** Local perf iteration: time a subset of the registry the same way
  * Bench does (warmup at sf0.001, best-of-3 at the target SF, noop
  * sink). Usage: `run_class.sh graft.tools.Time <sfDir> [-cold] <name>...`
  *
  * `-cold` releases registered caches between runs exactly like Bench
  * does — without it, a query that persists an intermediate gets
  * plan-matching cache reuse in runs 2-3 and `best` reports the warm
  * cost, which is NOT the number Bench will print.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, rest @ _*) = args
    val cold = rest.contains("-cold")
    val analyze = rest.contains("-analyze")
    val names = rest.filterNot(f => f == "-cold" || f == "-analyze")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.ui.enabled", "false")
      // match Bench: without this the 100-entry generated-class cache
      // makes timings include Janino recompiles Bench won't pay
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    val spark = graft.core.Sessions.applyExtraConf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `-analyze` reproduces the nightly-pipeline world (TierRefresh's
    // analyze_raw step): raw tables carry exact rowCount/NDV, which is
    // the precondition for CBO join-reorder to consider them at all
    if (analyze) graft.io.TableStats.analyzeAll(spark, sfDir): Unit
    val sel = graft.SparkEntry.queries.filter(kv => names.contains(kv._1)).toSeq.sortBy(_._1)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    def release(): Unit = if (cold) {
      // blocking, matching Bench: async block drops from a cache-heavy
      // query otherwise bleed into the NEXT query's samples (the
      // g9-after-g8 suite-order inflation diagnosed in r15)
      graft.core.Caching.releaseAll(blocking = true)
      spark.catalog.clearCache()
    }
    // Fail fast and LOUD: a query that can't analyze is named here with
    // its error, instead of dying anonymously mid-timing-loop.
    val warm = sel.filter { case (name, fn) =>
      val ok =
        try { run(fn, "/root/testdata/sf0.001"); true }
        catch { case e: Throwable =>
          System.err.println(s"[time] warmup FAILED $name: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
          false
        }
      release()
      ok
    }
    warm.foreach { case (name, fn) =>
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        run(fn, sfDir)
        val t = (System.nanoTime() - t0) / 1e9
        release()
        t
      }
      println(f"$name%-28s best=${ts.min}%7.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
