package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProjectionsSpec extends SparkSpec {

  test("nvlProject fills nulls with type-appropriate defaults") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some("a"), Some(1L), Some(1.5)),
      (None: Option[String], None: Option[Long], None: Option[Double]))
      .toDF("s", "l", "d")
    val out = Projections.nvlProject(df).collect()
    assert(out(1).getString(0) == "" && out(1).getLong(1) == 0L
      && out(1).getDouble(2) == 0.0)
    assert(out(0).getString(0) == "a") // non-null rows untouched
    assert(Projections.nvlProject(df).columns.toSeq == df.columns.toSeq)
  }

  test("sentinelToNull maps sentinels back to null, round-tripping nvlProject") {
    val s = spark
    import s.implicits._
    val df = Seq(("-", "x"), ("y", "-"), ("N/A", "z")).toDF("a", "b")
    val out = Projections.sentinelToNull(df, Seq("-", "N/A"))
    assert(out.filter(col("a").isNull).count() == 2)
    assert(out.filter(col("b").isNull).count() == 1)
    // nvlProject over the sentinel-nulled frame yields the '' defaults
    val filled = Projections.nvlProject(out)
    assert(filled.filter(col("a") === "").count() == 2)
  }
}
