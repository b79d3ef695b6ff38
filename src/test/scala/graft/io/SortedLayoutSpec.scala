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
}
