package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private lazy val ss = spark
  import ss.implicits._

  private def dimOf(rows: Seq[(Long, Long)], from: String = "2024-01-01") =
    rows.toDF("k", "v")
      .withColumn("valid_from", lit(from).cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  private def snapOf(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v")

  test("merge handles unchanged / changed / deleted / inserted keys") {
    val dim = dimOf(Seq(1L -> 10L, 2L -> 20L, 3L -> 30L))
    val snap = snapOf(Seq(1L -> 10L, 2L -> 99L, 4L -> 40L)) // 3 deleted, 4 new
    val out = Scd2.mergeSnapshot(dim, snap, "k", Seq("v"), "2024-06-01")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 10L, None, true),                    // unchanged
      (2L, 20L, Some("2024-06-01"), false),     // old version closed
      (2L, 99L, None, true),                    // new version opened
      (3L, 30L, Some("2024-06-01"), false),     // deleted -> closed
      (4L, 40L, None, true)))                   // inserted -> opened
  }

  test("re-merging the identical snapshot is a no-op on current rows") {
    val dim = dimOf(Seq(1L -> 10L, 2L -> 20L))
    val snap = snapOf(Seq(1L -> 11L, 2L -> 20L))
    val once = Scd2.mergeSnapshot(dim, snap, "k", Seq("v"), "2024-06-01")
    val twice = Scd2.mergeSnapshot(once, snap, "k", Seq("v"), "2024-07-01")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("closed history passes through later merges untouched") {
    val dim = dimOf(Seq(1L -> 10L))
    val m1 = Scd2.mergeSnapshot(dim, snapOf(Seq(1L -> 20L)), "k", Seq("v"), "2024-02-01")
    val m2 = Scd2.mergeSnapshot(m1, snapOf(Seq(1L -> 30L)), "k", Seq("v"), "2024-03-01")
    // full lineage: 10 (closed), 20 (closed), 30 (open)
    val versions = m2.orderBy("valid_from").collect()
      .map(r => (r.getLong(1), r.getBoolean(4)))
    assert(versions.toSeq == Seq((10L, false), (20L, false), (30L, true)))
  }
}
