package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedLayoutSpec extends SparkSpec {

  test("range-sorted layout yields disjoint per-file key ranges, sorted inside") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val out = tmpDir("sorted-layout") + "/li"
    SortedLayout.writeRangeSorted(li, out, 6, col("l_shipdate"))

    val back = spark.read.parquet(out)
    assert(back.count() == li.count())

    val ranges = SortedLayout.fileRanges(back, "l_shipdate")
    assert(ranges.length >= 2 && ranges.length <= 6)
    // files cover disjoint ranges: each file's lo >= previous file's hi
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1.asInstanceOf[Comparable[Any]].compareTo(lo2) <= 0,
        s"overlap: $hi1 > $lo2")
    }

    // rows inside each file are sorted: per-file monotonic check via
    // a window over the physical order
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val unsorted = back
      .withColumn("prev", lag("l_shipdate", 1).over(w))
      .filter(col("prev") > col("l_shipdate"))
    assert(unsorted.isEmpty)
  }

  test("point predicate on the layout key prunes most files") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val out = tmpDir("sorted-prune") + "/li"
    SortedLayout.writeRangeSorted(li, out, 6, col("l_orderkey"))
    val back = spark.read.parquet(out)
    val k = li.agg(min("l_orderkey")).head().get(0)
    // the scan with the pushed point filter must touch exactly 1 file
    val touched = back.filter(col("l_orderkey") === k)
      .select(input_file_name()).distinct().count()
    assert(touched == 1)
  }

  test("z-order clusters BOTH dimensions: narrow ranges on either touch few files") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    val out = tmpDir("zorder") + "/li"
    val files = 8
    SortedLayout.writeZOrdered(li, out, files,
      col("l_orderkey"), unix_timestamp(col("l_shipdate")))
    val back = spark.read.parquet(out).cache()
    assert(back.count() == li.count())

    def touched(pred: org.apache.spark.sql.Column): Long =
      back.filter(pred).select(input_file_name()).distinct().count()

    // a ~5%-wide range on each dimension independently
    val (kLo, kHi) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      (lo, lo + (hi - lo) / 20)
    }
    val dThr = li.agg(expr("cast(min(l_shipdate) + interval 30 days as string)"))
      .head().getString(0)
    val nOrderkey = touched(col("l_orderkey").between(kLo, kHi))
    val nDate = touched(expr(s"l_shipdate < '$dThr'"))
    assert(nOrderkey < files, s"orderkey range touched all $files files")
    assert(nDate < files, s"date range touched all $files files")
    back.unpersist(): Unit
  }
}
