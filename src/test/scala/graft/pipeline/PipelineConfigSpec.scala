package graft.pipeline

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import graft.SparkSpec

class PipelineConfigSpec extends SparkSpec {

  private val configJson = """{
    "tables": ["nation", "region"],
    "derived": [
      {"name": "t1_nation_per_region", "schedule": "D",
       "sql": "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"},
      {"name": "t2_weekly_probe", "schedule": "W",
       "sql": "SELECT count(*) AS n FROM nation"}
    ],
    "retention_days": 7
  }"""

  test("config-driven DAG loads T0 tables then runs derived SQL in order") {
    val base = tmpDir("cfg")
    val cfgPath = s"$base/config.json"
    Files.writeString(Paths.get(cfgPath), configJson)

    val cfg = PipelineConfig.read(spark, cfgPath)
    assert(cfg.tables == Seq("nation", "region") && cfg.retention_days == 7)

    val out = s"$base/out"
    val jobs = PipelineConfig.jobs(cfg, sfDir, out)
    // Tuesday: weekly job must skip, daily chain must run
    val results = Pipeline.run(spark, jobs, LocalDate.of(2024, 1, 2), s"$base/runlog")
    val status = results.map(r => r.job -> r.status).toMap
    assert(status("load_nation") == Pipeline.Succeeded)
    assert(status("t1_nation_per_region") == Pipeline.Succeeded)
    assert(status("t2_weekly_probe") == Pipeline.Skipped)

    val derived = spark.read.parquet(s"$out/t1_nation_per_region")
    assert(derived.count() == 5) // 5 regions
    assert(derived.columns.toSeq.sorted == Seq("n", "r_name"))
  }
}
