package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution on read — the drift case the reference only
  * DETECTS (O6, `BkupRs.py:128-152` column-list compare) and
  * tolerates by forcing nullable (`AWS_GLUE_ETL.py:111-117`). A
  * 100 TB table accretes columns over months of writers; readers must
  * see the superset schema with nulls for rows predating a column,
  * and the drift gate must still fire when a table and its backup
  * diverge.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions columns across file generations; old rows " +
       "read null for new columns") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("evolve") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 3)
    assert(merged.filter(col("score").isNull).count() == 2)
    assert(merged.filter(col("id") === 3L).select("score")
      .head().getDouble(0) == 9.5)

    // without mergeSchema Spark answers from ONE footer — the read
    // still works but may miss the new column; the explicit option is
    // the contract a multi-writer table must pin
    val plain = s.read.parquet(dir)
    assert(plain.count() == 3)
  }

  test("the O6 drift gate still fires across generations") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("evolve2")
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir + "/src")
    Seq((1L, "a", "x")).toDF("id", "name", "extra").write.parquet(dir + "/bkp")
    val src = s.read.parquet(dir + "/src")
    val bkp = s.read.parquet(dir + "/bkp")
    intercept[IllegalArgumentException] {
      graft.core.SchemaUtil.assertSameColumns(src.schema, bkp.schema)
    }
  }
}
