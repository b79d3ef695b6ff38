package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksSpec extends SparkSpec {

  private lazy val ss = spark
  import ss.implicits._

  test("violations are counted per constraint in one pass") {
    val df = Seq(
      (Some(1L), "O", 10.0),
      (Some(2L), "X", -5.0),     // bad status, negative
      (None, "F", 3.0),          // null key
      (Some(2L), "P", 7.0),      // duplicate key
    ).toDF("k", "status", "amount")
    val rep = Checks.report(df,
      Seq(Checks.notNull("k"), Checks.inSet("status", Seq("O", "F", "P")),
        Checks.nonNegative("amount")),
      Seq(Checks.Unique(Seq("k"))))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(rep("not_null_k") == ((1L, 4L, false)))
    assert(rep("accepted_values_status") == ((1L, 4L, false)))
    assert(rep("non_negative_amount") == ((1L, 4L, false)))
    // 4 rows, 3 distinct keys (incl. null struct) -> 1 dup
    assert(rep("unique_k")._1 >= 1L && !rep("unique_k")._3)
  }

  test("clean data passes every constraint") {
    val rep = Checks.q32DqReport(spark, sfDir)
    assert(rep.count() == 5)
    assert(rep.filter(!col("passed")).isEmpty)
  }

  test("the whole suite is a single aggregate over one scan") {
    val plan = Checks.q32DqReport(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one parquet scan feeds every constraint
    assert("Scan parquet".r.findAllIn(plan).size == 1)
  }

  test("quarantine splits losslessly and tags every violated constraint") {
    val df = Seq(
      ("a", 5L), ("b", -1L), (null.asInstanceOf[String], 3L), (null, -2L))
      .toDF("name", "amount")
    val checks = Seq(Checks.notNull("name"), Checks.nonNegative("amount"))
    val (good, bad) = Checks.quarantine(df, checks)
    assert(good.columns.toSeq === df.columns.toSeq) // schema-identical
    assert(good.count() + bad.count() === df.count()) // lossless split
    assert(good.count() === 1)
    val reasons = bad.select(col("amount"), col("__violations")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[String](1).toList).toMap
    assert(reasons(-1L) === List("non_negative_amount"))
    assert(reasons(3L) === List("not_null_name"))
    assert(reasons(-2L) === List("non_negative_amount", "not_null_name"))
  }
}
