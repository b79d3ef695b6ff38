package graft.pipeline

import java.time.LocalDate

import graft.SparkSpec
import graft.io.RunLog
import graft.pipeline.Pipeline._

class PipelineSpec extends SparkSpec {

  // 2024-01-01 is a Monday; 2024-01-02 a Tuesday.
  private val monday = LocalDate.of(2024, 1, 1)
  private val tuesday = LocalDate.of(2024, 1, 2)

  private def okJob(name: String, deps: Seq[String] = Nil,
                    schedule: Schedule = Daily) =
    Job(name, s"tbl_$name", schedule, deps)((_, _) => 7L)

  test("topoOrder respects dependencies and detects cycles") {
    val jobs = Seq(okJob("c", deps = Seq("b")), okJob("a"), okJob("b", deps = Seq("a")))
    assert(Pipeline.topoOrder(jobs).map(_.name) == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] {
      Pipeline.topoOrder(Seq(okJob("x", deps = Seq("y")), okJob("y", deps = Seq("x"))))
    }
  }

  test("weekly jobs run on Monday, are Skipped otherwise, with run-log rows") {
    val log = tmpDir("runlog") + "/log"
    val jobs = Seq(okJob("daily"), okJob("weekly", schedule = Weekly))

    val mon = Pipeline.run(spark, jobs, monday, log)
    assert(mon.map(r => r.job -> r.status).toMap ==
      Map("daily" -> Succeeded, "weekly" -> Succeeded))

    val tue = Pipeline.run(spark, jobs, tuesday, log)
    assert(tue.map(r => r.job -> r.status).toMap ==
      Map("daily" -> Succeeded, "weekly" -> Skipped))

    val rows = RunLog.read(spark, log).collect()
    assert(rows.length == 4)
    val tueWeekly = rows.filter(r =>
      r.getAs[String]("bat_dt") == "20240102" && r.getAs[String]("job_nm") == "weekly")
    assert(tueWeekly.head.getAs[String]("success_yn") == "S")
  }

  test("failure exhausts retries, logs N, and skips dependents") {
    val log = tmpDir("runlog") + "/log"
    var attempts = 0
    val boom = Job("boom", "tbl_boom", Daily, Nil, retries = 2)((_, _) => {
      attempts += 1; throw new RuntimeException("nope")
    })
    val results = Pipeline.run(spark, Seq(boom, okJob("down", deps = Seq("boom"))),
      monday, log)
    assert(attempts == 3) // 1 try + 2 retries (Airflow_week.py:47-48)
    assert(results.map(r => r.job -> r.status).toMap ==
      Map("boom" -> Failed, "down" -> Skipped))
    val logged = RunLog.read(spark, log).collect()
      .map(r => r.getAs[String]("job_nm") -> r.getAs[String]("success_yn")).toMap
    assert(logged == Map("boom" -> "N", "down" -> "S"))
  }

  test("retry succeeds after transient failure and reports attempts") {
    val log = tmpDir("runlog") + "/log"
    var n = 0
    val flaky = Job("flaky", "tbl_flaky")((_, _) => {
      n += 1; if (n < 2) throw new RuntimeException("transient") else 5L
    })
    val res = Pipeline.run(spark, Seq(flaky), monday, log)
    assert(res.head.status == Succeeded && res.head.attempts == 2 && res.head.rows == 5L)
  }

  test("jobs using registering query paths leave the cache manager empty") {
    val log = tmpDir("runlog") + "/log"
    val caching = Job("caching", "tbl_caching")((s, _) => {
      import graft.core.Caching.RegisterSyntax
      val df = graft.core.Tables.load(s, sfDir, "nation").registerCache()
      df.count()
    })
    val failing = Job("leaky_fail", "tbl_leaky", Daily, Nil, retries = 0)((s, _) => {
      import graft.core.Caching.RegisterSyntax
      graft.core.Tables.load(s, sfDir, "region").registerCache().count()
      throw new RuntimeException("after registering")
    })
    val res = Pipeline.run(spark, Seq(caching, failing), monday, log)
    assert(res.map(_.status) == Seq(Succeeded, Failed))
    assert(spark.sharedState.cacheManager.isEmpty,
      "Pipeline.run must release registered caches per attempt, success or failure")
  }
}
