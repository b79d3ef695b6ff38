package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LongArrayDotSpec extends SparkSpec {

  test("matches the aggregate/zip_with composition, including null arrays") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L), Seq(2L, 9L)),
      (Seq.empty[Long], Seq.empty[Long]))
      .toDF("a", "b")
    val out = df.select(
      LongArrayDot.dot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x*y), cast(0 as bigint), (acc, x) -> acc + x)").as("composed"))
    assert(out.filter(col("native") =!= col("composed")).isEmpty)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(32L, -14L, 0L))

    val withNull = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(LongArrayDot.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("runs inside whole-stage codegen") {
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
      .withColumn("qv", expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"))
      .select(LongArrayDot.dot(col("qv"), col("qv")).as("n2"))
    e.collect()
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // codegen stage marker
    assert(e.filter(col("n2") <= 0).isEmpty) // norms strictly positive
  }
}
