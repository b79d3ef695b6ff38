package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.io.IdempotentWriter

/** S4/O1 — config-as-data: the reference drives its DAG from JSON
  * config objects (table lists, SQL-file lists, retention windows —
  * `comlib.py:59-85`, `Airflow_week.py:37-38,52-66,81-129`). Here the
  * config is a JSON document read through Spark's JSON source into a
  * typed case class, and [[jobs]] expands it into the Pipeline DAG:
  * one load job per table (T0), one derived job per named SQL file
  * (T1), chained like the reference's TaskGroups.
  */
object PipelineConfig {

  case class Config(
      tables: Seq[String],
      derived: Seq[DerivedJob],
      retention_days: Long) // Spark's JSON inference reads ints as bigint

  case class DerivedJob(name: String, sql: String, schedule: String)

  /** Read a single-document JSON config (multiLine) into [[Config]]. */
  def read(spark: SparkSession, path: String): Config = {
    import spark.implicits._
    spark.read.option("multiLine", "true").json(path)
      .selectExpr("tables", "derived", "retention_days")
      .as[Config]
      .collect()
      .headOption
      .getOrElse(throw new IllegalArgumentException(s"empty config: $path"))
  }

  /** Expand a config into the job DAG: every T0 table load runs first,
    * each derived SQL job depends on all loads (the reference's
    * `t0_daily >> t1_daily` chain, `Airflow_week.py:332-377`).
    */
  def jobs(cfg: Config, sfDir: String, outDir: String): Seq[Pipeline.Job] = {
    val loads = cfg.tables.map { t =>
      Pipeline.Job(s"load_$t", t)((spark, _) =>
        IdempotentWriter.fullRefresh(Tables.load(spark, sfDir, t), s"$outDir/$t"))
    }
    val loadNames = loads.map(_.name)
    val derived = cfg.derived.map { d =>
      val sched = if (d.schedule == "W") Pipeline.Weekly else Pipeline.Daily
      Pipeline.Job(d.name, d.name, sched, loadNames) { (spark, _) =>
        cfg.tables.foreach(t =>
          spark.read.parquet(s"$outDir/$t").createOrReplaceTempView(t))
        IdempotentWriter.fullRefresh(spark.sql(d.sql), s"$outDir/${d.name}")
      }
    }
    loads ++ derived
  }
}
