package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Contract pins for the backfill planner:
  *  - gaps are found by partition LISTING against the expected range;
  *  - batches are contiguous runs, oldest first, capped at
  *    maxPerBatch (each batch re-runnable as ONE date-range scan);
  *  - a complete table plans zero work; planning never writes.
  */
class BackfillSpec extends SparkSpec {

  private def mkTable(dates: Seq[String]): String = {
    val dir = Files.createTempDirectory("backfill").toString
    dates.foreach(d => Files.createDirectories(
      java.nio.file.Paths.get(dir, s"dt=$d")))
    dir
  }

  test("missing dates are detected and batched contiguously, oldest first") {
    // present: 0101-0103, 0106; missing: 0104, 0105, 0107..0110
    val dir = mkTable(Seq("20240101", "20240102", "20240103", "20240106"))
    val p = Backfill.plan(spark, dir, "dt", "20240101", "20240110", maxPerBatch = 3)
    assert(p.expected === 10 && p.present === 4)
    assert(p.missing === Seq("20240104", "20240105",
      "20240107", "20240108", "20240109", "20240110"))
    // two contiguous runs; the 4-day run splits at the 3-cap
    assert(p.batches.map(b => (b.from, b.to)) === Seq(
      ("20240104", "20240105"),
      ("20240107", "20240109"),
      ("20240110", "20240110")))
  }

  test("complete table plans zero batches; planning writes nothing") {
    val dates = Backfill.dateRange("20240201", "20240205")
    val dir = mkTable(dates)
    val before = new java.io.File(dir).list().sorted.toSeq
    val p = Backfill.plan(spark, dir, "dt", "20240201", "20240205")
    assert(p.missing.isEmpty && p.batches.isEmpty && p.present === 5)
    assert(new java.io.File(dir).list().sorted.toSeq === before)
  }

  test("absent table: everything is missing, range arithmetic spans months") {
    val p = Backfill.plan(spark, "/nonexistent/backfill-test", "dt",
      "20240227", "20240302", maxPerBatch = 10)
    // 2024 is a leap year: 27,28,29 Feb + 1,2 Mar
    assert(p.missing === Seq("20240227", "20240228", "20240229",
      "20240301", "20240302"))
    assert(p.batches.size === 1 && p.batches.head.dates.size === 5)
  }

  test("inverted range and non-positive cap are refused") {
    intercept[IllegalArgumentException] {
      Backfill.dateRange("20240105", "20240101")
    }
    intercept[IllegalArgumentException] {
      Backfill.contiguousBatches(Seq("20240101"), 0)
    }
  }
}
