package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.io.AtomicPublish
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline.{Job, Succeeded}
import graft.text.{Keywords, TokenStore}

/** End-to-end text pipeline over the DAG runner: tokenize tier →
  * store-served keywords → atomic publish, each stage a run-logged job
  * with dependencies — the reference's EP1 orchestration shape applied
  * to this engine's text stack.
  */
class TextPipelineE2ESpec extends SparkSpec {

  test("tokenize -> keywords-from-store -> atomic publish, all run-logged") {
    val base = tmpDir("textpipe")
    val store = s"$base/tokens"
    val published = s"$base/keywords"
    val runLog = s"$base/run_log"

    val jobs = Seq(
      Job("tokenize_tier", store) { (s, _) =>
        TokenStore.materialize(s, sfDir, store)
        TokenStore.load(s, store).count()
      },
      Job("keywords_publish", published, deps = Seq("tokenize_tier")) { (s, _) =>
        AtomicPublish.publish(TokenStore.topKeywordsFromStore(s, store), published)
      })

    val results = Pipeline.run(spark, jobs, LocalDate.of(2026, 8, 12), runLog)
    assert(results.forall(_.status == Succeeded), results.mkString("; "))

    // published table equals the direct recompute path
    val out = spark.read.parquet(published)
    val direct = Keywords.k1TopKeywords(spark, sfDir)
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)

    // both jobs logged Y with their real row counts
    val log = graft.io.RunLog.read(spark, runLog)
    assert(log.count() == 2)
    assert(log.filter(col("success_yn") =!= "Y").isEmpty)
    val published_cnt = log.filter(col("job_nm") === "keywords_publish")
      .select("cretn_cnt").head().getLong(0)
    assert(published_cnt == out.count())
  }
}
