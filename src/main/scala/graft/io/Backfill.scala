package graft.io

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Backfill planning over a date-partitioned table: diff the expected
  * date range against the partitions actually on storage and emit a
  * bounded, ordered batch plan — the gap-repair step the reference
  * runs by hand when an Airflow day is missed (its schedule typing
  * O2/M4 only moves FORWARD; a skipped day stays missing until someone
  * re-runs it with that date parameter).
  *
  * Design points:
  *  - Detection is a partition LISTING (metadata-only, like
  *    [[Backup.backupDates]]) — never a data scan; at 100 TB the
  *    listing is thousands of names while the data is petabytes.
  *  - The plan is chunked into [[Plan.batches]] of at most
  *    `maxPerBatch` CONTIGUOUS dates, oldest first: oldest-first makes
  *    downstream incremental consumers (SCD2, AggView) see history in
  *    order, contiguity keeps each re-run's source-side predicate a
  *    single date range (one partition-pruned scan, not N point
  *    lookups), and the cap bounds each run's blast radius and retry
  *    cost.
  *  - Pure metadata in/plan out — execution stays with the caller
  *    (Pipeline jobs take a date parameter already); the planner
  *    doesn't write anything, so it composes with dry-run tooling.
  */
object Backfill {

  private val Fmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  final case class Batch(dates: Seq[String]) {
    def from: String = dates.head
    def to: String = dates.last
  }

  final case class Plan(expected: Int, present: Int, missing: Seq[String],
                        batches: Seq[Batch])

  /** All yyyyMMdd dates in [fromDt, toDt], inclusive. */
  private[io] def dateRange(fromDt: String, toDt: String): Seq[String] = {
    val from = LocalDate.parse(fromDt, Fmt)
    val to = LocalDate.parse(toDt, Fmt)
    require(!from.isAfter(to), s"backfill range is inverted: $fromDt > $toDt")
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .map(_.format(Fmt)).toSeq
  }

  /** Split missing dates into runs of consecutive days, then cap each
    * run at `maxPerBatch`. */
  private[io] def contiguousBatches(missing: Seq[String], maxPerBatch: Int): Seq[Batch] = {
    require(maxPerBatch > 0, s"maxPerBatch must be positive, got $maxPerBatch")
    if (missing.isEmpty) Seq.empty
    else {
      val runs = missing.tail.foldLeft(List(List(missing.head))) { (acc, d) =>
        val prev = LocalDate.parse(acc.head.head, Fmt)
        if (LocalDate.parse(d, Fmt) == prev.plusDays(1)) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      runs.reverse.map(_.reverse)
        .flatMap(_.grouped(maxPerBatch))
        .map(Batch(_))
    }
  }

  /** Partitions present under `dir` for `partCol` (metadata listing). */
  def presentDates(spark: SparkSession, dir: String, partCol: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(_.stripPrefix(s"$partCol="))
      .sorted
  }

  def plan(spark: SparkSession, dir: String, partCol: String,
           fromDt: String, toDt: String, maxPerBatch: Int = 7): Plan = {
    val expected = dateRange(fromDt, toDt)
    val present = presentDates(spark, dir, partCol).toSet
    val missing = expected.filterNot(present)
    Plan(expected.size, expected.size - missing.size, missing,
      contiguousBatches(missing, maxPerBatch))
  }
}
