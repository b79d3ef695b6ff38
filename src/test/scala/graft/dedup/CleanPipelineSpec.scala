package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleanPipelineSpec extends SparkSpec {

  test("composed clean publishes a canonical corpus, accounts every drop, " +
       "and logs the K6 row") {
    val s = spark
    val out = tmpDir("clean") + "/corpus"
    val log = tmpDir("cleanlog") + "/run_log"
    val r = CleanPipeline.run(s, sfDir, out, log, jobRunId = "spec-run")

    // accounting closes: input = final + exact drops + cluster drops
    assert(r.nInput == r.nFinal + r.nExactDropped + r.nClusterDropped, r)
    assert(r.nFinal > 0 && r.nFinal <= r.nInput)
    assert(r.nVerifiedPairs <= r.nCandidatePairs, r)

    // published table readable, row count matches the report
    val published = s.read.parquet(out)
    assert(published.count() == r.nFinal)
    // canonical corpus has no exact duplicates left
    val dupGroups = published
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), " +", " ")))
      .count().filter(col("count") > 1).count()
    assert(dupGroups == 0, "exact duplicates survived the clean")

    // K6 audit row on the success path
    val logRow = graft.io.RunLog.read(s, log)
      .filter(col("job_nm") === "corpus_clean").collect()
    assert(logRow.length == 1)
    assert(logRow(0).getAs[String]("success_yn") == "Y")
    assert(logRow(0).getAs[Long]("cretn_cnt") == r.nFinal)
  }

  test("re-running the clean is idempotent (same canonical set)") {
    val s = spark
    val base = tmpDir("clean2")
    val r1 = CleanPipeline.run(s, sfDir, base + "/c1", base + "/log", "run-a")
    val r2 = CleanPipeline.run(s, sfDir, base + "/c2", base + "/log", "run-b")
    assert(r1 == r2)
    val a = s.read.parquet(base + "/c1").select("doc_id")
    val b = s.read.parquet(base + "/c2").select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("durable-components flavour publishes the identical canonical set") {
    val s = spark
    val base = tmpDir("clean3")
    val ckpt = java.nio.file.Files.createTempDirectory("clean-ckpt").toString
    try {
      s.sparkContext.setCheckpointDir(ckpt)
      val r1 = CleanPipeline.run(s, sfDir, base + "/local", base + "/log", "run-l")
      val r2 = CleanPipeline.run(s, sfDir, base + "/durable", base + "/log", "run-d",
        durableComponents = true)
      assert(r1 == r2)
      val a = s.read.parquet(base + "/local").select("doc_id")
      val b = s.read.parquet(base + "/durable").select("doc_id")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt)): Unit
    }
  }
}
