package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** S-family robustness: the reference *tolerates* schema drift
  * (nullable-relax re-read, `AWS_GLUE_ETL.py:111-117`) and sentinel
  * garbage (`"-"` → null, `log_screen.py:190-197`). The JSON-source
  * analog is malformed-record handling — every mode the engine
  * supports, pinned by test.
  */
class MalformedInputSpec extends SparkSpec {

  private def stage(): String = {
    val dir = tmpDir("malformed")
    Files.writeString(Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2, "v": "also ok"}
        |{not json at all
        |{"id": "NaN-ish", "v": 3}
        |""".stripMargin)
    dir
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines corrupt rows instead of failing the batch") {
    val df = spark.read.schema(schema).json(stage()).cache()
    try {
      assert(df.count() == 4)
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      // type-mismatched id AND the non-JSON line are both quarantined
      assert(good.count() == 2 && bad.count() == 2)
      // the original payload survives for a dead-letter sink
      assert(bad.select("_corrupt_record").collect()
        .exists(_.getString(0).contains("not json")))
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows; FAILFAST refuses the batch") {
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .json(stage())
    assert(dropped.filter(col("id").isNotNull).count() == 2)
    val ex = intercept[Exception] {
      spark.read
        .schema(StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
        .option("mode", "FAILFAST").json(stage()).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      (ex.getCause != null && ex.getCause.getMessage.toLowerCase.contains("malformed")))
  }
}
