package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {

  test("t5 redaction leaves no raw email or phone and counts every hit") {
    val out = TextAnalysis.t5PiiRedact(spark, sfDir).cache()
    assert(out.count() > 0)
    // the fixture plants exactly one email + one phone per row
    assert(out.filter(col("n_pii") =!= 2).isEmpty)
    val leaked = out.filter(
      col("redacted").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
      col("redacted").rlike("\\+1-555-[0-9]{4}"))
    assert(leaked.isEmpty, "raw PII survived redaction")
    assert(out.filter(!col("redacted").contains("[EMAIL]") ||
      !col("redacted").contains("[PHONE]")).isEmpty)
    out.unpersist(): Unit
  }
}
