package graft

import java.io.File
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.io.{Backup, Export, IdempotentWriter, RunLog}
import graft.pipeline.Pipeline

/** EP1+EP2 end to end (SURVEY §5's e2e row): a config-shaped DAG that
  * loads the dims, builds the EP2 document index, exports it as the
  * reference's single-gzip-JSON UNLOAD shape, backs it up with a
  * bkup_dt partition, and retention-sweeps an old date — with a
  * run-log row per job and count gates throughout.
  */
class EndToEndSpec extends SparkSpec {

  test("tiered pipeline: load -> doc build -> export -> backup -> retention") {
    val base = tmpDir("e2e")
    val out = s"$base/out"; val log = s"$base/runlog"; val bkp = s"$base/backup"

    val jobs = Seq(
      Pipeline.Job("t0_load_orders", "orders")((s, _) =>
        IdempotentWriter.fullRefresh(
          graft.core.Tables.load(s, sfDir, "orders"), s"$out/orders")),
      Pipeline.Job("t2_docs", "documents_idx", deps = Seq("t0_load_orders"))((s, _) => {
        val docs = graft.ops.DocAssembly.documents(s, sfDir)
        IdempotentWriter.fullRefresh(docs, s"$out/docs")
      }),
      Pipeline.Job("t4_export", "docs_export", deps = Seq("t2_docs"))((s, _) => {
        Export.singleGzipJson(s.read.parquet(s"$out/docs"), s"$out/export")
        s.read.json(s"$out/export").count()
      }),
      Pipeline.Job("t5_backup", "docs_backup", deps = Seq("t2_docs"))((s, _) => {
        Backup.backup(s.read.parquet(s"$out/docs"), bkp, "docs", "20240105")
      }),
    )

    val results = Pipeline.run(spark, jobs, LocalDate.of(2024, 1, 5), log)
    assert(results.forall(_.status == Pipeline.Succeeded), results)

    // count gates: every tier carried the same row count
    val nDocs = spark.read.parquet(s"$out/docs").count()
    assert(nDocs > 0)
    assert(spark.read.json(s"$out/export").count() == nDocs)
    assert(new File(s"$out/export").listFiles()
      .count(_.getName.endsWith(".json.gz")) == 1)

    // backup second date, then sweep the first
    Backup.backup(spark.read.parquet(s"$out/docs"), bkp, "docs", "20240112")
    assert(Backup.retentionSweep(spark, bkp, "docs", "20240110") == Seq("20240105"))
    assert(Backup.backupDates(spark, bkp, "docs") == Seq("20240112"))
    assert(spark.read.parquet(s"$bkp/docs").count() == nDocs)

    // run-log: one Y row per job with the doc count on t2
    val rows = RunLog.read(spark, log).collect()
    assert(rows.length == jobs.length)
    assert(rows.forall(_.getAs[String]("success_yn") == "Y"))
    val t2 = rows.find(_.getAs[String]("job_nm") == "t2_docs").get
    assert(t2.getAs[Long]("cretn_cnt") == nDocs)

    // document shape: arrays + the dim-8 feature vector survived the
    // round trip (EP2's ES document model)
    val doc = spark.read.parquet(s"$out/docs")
    assert(doc.select(size(col("feature_vector"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
  }
}
