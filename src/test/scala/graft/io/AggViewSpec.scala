package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggViewSpec extends SparkSpec {

  test("incremental refresh equals the full recompute after each batch of " +
       "day partitions, without rescanning old days") {
    val s = spark
    val base = tmpDir("aggview")
    val src = base + "/events"
    val view = base + "/per_user_totals"

    val ev = graft.core.Tables.load(s, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("vc", round(col("value") * 100).cast("long"))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    assert(days.length >= 3, "fixture needs several days")
    val (firstDays, laterDays) = days.splitAt(2)

    def writeDays(ds: Seq[String]): Unit = ev
      .filter(col("day").isin(ds: _*))
      .write.partitionBy("day").mode("append").parquet(src)

    def keys = Seq("user_id")
    def aggs = Seq(
      "n_events" -> count(lit(1)),
      "total_cents" -> sum(col("vc")))

    // batch 1: two days arrive
    writeDays(firstDays)
    val p1 = AggView.refresh(s, src, "day", view, keys, aggs)
    assert(p1.sorted == firstDays.sorted.toSeq)
    val expected1 = ev.filter(col("day").isin(firstDays.toSeq: _*))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("vc").as("total_cents"))
    val got1 = AggView.read(s, view)
    assert(got1.exceptAll(expected1).isEmpty && expected1.exceptAll(got1).isEmpty)

    // batch 2: the remaining days arrive; only they are processed
    writeDays(laterDays)
    val p2 = AggView.refresh(s, src, "day", view, keys, aggs)
    assert(p2.sorted == laterDays.sorted.toSeq)
    val expectedAll = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("vc").as("total_cents"))
    val gotAll = AggView.read(s, view)
    assert(gotAll.exceptAll(expectedAll).isEmpty && expectedAll.exceptAll(gotAll).isEmpty)

    // batch 3: nothing new — refresh is a no-op
    assert(AggView.refresh(s, src, "day", view, keys, aggs).isEmpty)
  }

  test("streaming mergeBatch is exactly-once: a replayed batch id is a no-op") {
    val s = spark
    import s.implicits._
    val view = tmpDir("aggview-stream") + "/totals"
    def keys = Seq("k")
    def aggs = Seq("n" -> count(lit(1)), "total" -> sum(col("v")))
    val b0 = Seq(("a", 10L), ("b", 5L)).toDF("k", "v")
    val b1 = Seq(("a", 1L), ("c", 2L)).toDF("k", "v")

    assert(AggView.mergeBatch(s, view, 0L, b0, keys, aggs))
    assert(AggView.mergeBatch(s, view, 1L, b1, keys, aggs))
    // crash-replay of batch 1: same id, same data — must not double-count
    assert(!AggView.mergeBatch(s, view, 1L, b1, keys, aggs))

    val got = AggView.read(s, view).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 11L), ("b", 1L, 5L), ("c", 1L, 2L)), got)
  }
}
