package graft.pipeline

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{DayOfWeek, Instant, LocalDate}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.io.RunLog

/** O1-O5 — the orchestration layer: a DAG of named jobs with
  * daily/weekly schedule typing, topological execution, bounded
  * retries, and a run-log row on every outcome.
  *
  * Mirrors `Airflow_week.py`: TaskGroup dependency chain
  * (`:332-377` `t0 >> t1 >> t2 >> … >> t5`), schedule typing `D`/`W`
  * with a weekday gate (`:135-156` — weekly jobs run only when
  * `weekday == 0`, i.e. Monday), `retries: 2` (`:47-48`), and the
  * per-job try/except/else run-log insert (`AWS_GLUE_ETL.py:137-170`).
  * Skipped jobs are recorded, not silently dropped.
  */
object Pipeline {

  sealed trait Schedule
  case object Daily extends Schedule
  case object Weekly extends Schedule

  /** A job's body returns the row count it produced (the A4 gate). */
  final case class Job(
      name: String,
      targetTable: String,
      schedule: Schedule = Daily,
      deps: Seq[String] = Nil,
      retries: Int = 2)(val body: (SparkSession, String) => Long)

  sealed trait Status
  case object Succeeded extends Status
  case object Failed extends Status
  case object Skipped extends Status

  final case class Result(job: String, status: Status, rows: Long,
                          attempts: Int, error: Option[String],
                          note: String = "")

  /** Per-job annotation channel: a body may set this (e.g. TierRefresh
    * records "mode=merge v=12") and [[run]] carries it into the job's
    * run-log row — successful rows' otherwise-empty `error_msg` slot,
    * the same slot Skipped rows already use for "weekly gate". Cleared
    * before every attempt. Thread-local (r11 review): run() is
    * single-threaded per DAG, but two DAGs in one JVM (a job server)
    * would cross-clobber a shared slot — one run's clear erasing the
    * note another run's job just set. */
  private val jobNoteTl = ThreadLocal.withInitial[Option[String]](() => None)
  private[pipeline] def jobNote: Option[String] = jobNoteTl.get()
  private[pipeline] def jobNote_=(v: Option[String]): Unit = jobNoteTl.set(v)

  /** Kahn topological order; fails fast on unknown deps or cycles. */
  private[pipeline] def topoOrder(jobs: Seq[Job]): Seq[Job] = {
    val byName = jobs.map(j => j.name -> j).toMap
    jobs.foreach(j => j.deps.foreach(d =>
      require(byName.contains(d), s"job ${j.name}: unknown dep $d")))
    val indeg = mutable.Map(jobs.map(j => j.name -> j.deps.size): _*)
    val out = jobs.map(j => j.name -> mutable.Buffer[String]()).toMap
    jobs.foreach(j => j.deps.foreach(d => out(d) += j.name))
    // queue keyed by declaration order for deterministic scheduling
    val order = jobs.map(_.name).zipWithIndex.toMap
    val ready = mutable.PriorityQueue.empty[String](Ordering.by(n => -order(n)))
    indeg.foreach { case (n, d) => if (d == 0) ready.enqueue(n) }
    val sorted = mutable.Buffer[Job]()
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      sorted += byName(n)
      out(n).foreach { m => indeg(m) -= 1; if (indeg(m) == 0) ready.enqueue(m) }
    }
    require(sorted.size == jobs.size,
      s"dependency cycle among: ${jobs.map(_.name).diff(sorted.map(_.name).toSeq)}")
    sorted.toSeq
  }

  private val Ymd = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Run the DAG for batch date `batDt`. A failed job marks its
    * transitive dependents Skipped; weekly jobs run only on Monday
    * (the reference's `weekday == 0` gate). Every job gets a run-log
    * row — Succeeded, Failed, and Skipped alike.
    */
  def run(spark: SparkSession, jobs: Seq[Job], batDt: LocalDate,
          runLogPath: String): Seq[Result] = {
    val dt = batDt.format(Ymd)
    val runId = s"run-$dt-${System.nanoTime()}"
    val done = mutable.Map[String, Status]()
    val results = topoOrder(jobs).map { job =>
      val depFailed = job.deps.exists(d => done(d) != Succeeded)
      val weeklySkip = job.schedule == Weekly && batDt.getDayOfWeek != DayOfWeek.MONDAY
      val result =
        if (depFailed) Result(job.name, Skipped, 0, 0, Some("upstream failure"))
        else if (weeklySkip) Result(job.name, Skipped, 0, 0, Some("weekly gate"))
        else {
          var attempt = 0
          var outcome: Option[Result] = None
          while (outcome.isEmpty && attempt <= job.retries) {
            attempt += 1
            jobNote = None
            try {
              // A job body that routes through registering query paths
              // (graft.core.Caching.register) must not leak cached
              // blocks into a long-lived DAG server: release per
              // attempt, success or failure, same guarantee Bench and
              // Verify give per query.
              val rows = graft.core.Caching.withReleased(job.body(spark, dt))
              outcome = Some(Result(job.name, Succeeded, rows, attempt, None,
                jobNote.getOrElse("")))
            } catch {
              case NonFatal(e) if attempt > job.retries =>
                outcome = Some(Result(job.name, Failed, 0, attempt,
                  Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
              case NonFatal(_) => // retry
            }
          }
          outcome.get
        }
      done(job.name) = result.status
      RunLog.append(spark, runLogPath, RunLog.Entry(
        bat_dt = dt,
        bat_req_tm = Timestamp.from(Instant.now()).toString,
        job_nm = job.name,
        taget_tbl_nm = job.targetTable,
        cretn_cnt = result.rows,
        success_yn = result.status match {
          case Succeeded => "Y"
          case Failed    => "N"
          case Skipped   => "S"
        },
        error_msg = result.error.getOrElse(result.note),
        job_run_id = runId,
        platform_dt = Timestamp.from(Instant.now().plusSeconds(9 * 3600))))
      result
    }
    results
  }
}
