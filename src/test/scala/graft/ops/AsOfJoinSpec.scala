package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("as-of picks the latest right row at or before each left time") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L), (1L, 205L), (2L, 50L), (3L, 10L))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, 90L, "a"), (1L, 200L, "b"), (2L, 60L, "late"))
      .toDF("k", "rt", "v").withColumn("rt", col("rt").cast("timestamp"))
    val out = AsOfJoin.asOf(left, right,
      key = (left("k"), right("k")), time = (left("t"), right("rt")),
      rightCols = Seq(right("v")))
      .select(col("t").cast("long").as("t"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(100L -> "a", 205L -> "b", 50L -> null, 10L -> null))
  }

  test("q21 keeps every event exactly once and never joins a future order") {
    val q = AsOfJoin.q21AsofJoin(spark, sfDir)
    val events = graft.core.Tables.load(spark, sfDir, "events")
    assert(q.count() == events.count())
    assert(q.select("event_id").distinct().count() == events.count())
    assert(q.filter(col("last_orderdate").cast("timestamp") > col("ts")).isEmpty)
  }
}
