package graft.tools

import graft.core.Sessions

/** Dump explain("formatted") for selected queries — the plan-review
  * loop (builder contract: iterate until the plan is the one you'd
  * want at 1000 executors, not the first one that passes).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, appName = "graft-explain")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // GRAFT_ANALYZE=1: explain under the nightly-analyzed world (raw
    // tables carry rowCount/NDV); pair with GRAFT_EXTRA_CONF for
    // optimizer-flag plan diffs
    if (sys.env.get("GRAFT_ANALYZE").contains("1"))
      graft.io.TableStats.analyzeAll(spark, sfDir): Unit
    // `-cost` prints the optimized logical plan with per-node row/size
    // estimates (the inputs to every broadcast/SMJ decision) instead of
    // the formatted physical plan
    val rest = args.drop(1).toSeq
    val mode = if (rest.contains("-cost")) "cost" else "formatted"
    val names0 = rest.filterNot(_ == "-cost")
    val names = if (names0.nonEmpty) names0
                else graft.queries.Registry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"\n======== $n ========")
      graft.queries.Registry.queries(n)(spark, sfDir).explain(mode)
    }
    spark.stop()
  }
}
