package graft.core

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaUtilSpec extends SparkSpec {

  private val strict = StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StructType(Seq(
      StructField("c", IntegerType, nullable = false))), nullable = false)))

  test("relaxNullability flips every field including nested structs") {
    val relaxed = SchemaUtil.relaxNullability(strict)
    assert(relaxed.fields.forall(_.nullable))
    val inner = relaxed("b").dataType.asInstanceOf[StructType]
    assert(inner.fields.forall(_.nullable))
  }

  test("diffColumns reports asymmetric differences sorted") {
    val a = StructType(Seq(StructField("x", StringType), StructField("y", StringType)))
    val b = StructType(Seq(StructField("y", StringType), StructField("z", StringType)))
    assert(SchemaUtil.diffColumns(a, b) == (Seq("x"), Seq("z")))
  }

  test("assertSameColumns tolerates only the declared extra column") {
    val src = StructType(Seq(StructField("x", StringType)))
    val bkp = StructType(Seq(StructField("x", StringType), StructField("bkup_dt", StringType)))
    SchemaUtil.assertSameColumns(src, bkp, ignoreInBkp = Set("bkup_dt"))
    intercept[IllegalArgumentException] {
      SchemaUtil.assertSameColumns(src, bkp) // bkup_dt not ignored -> drift
    }
  }
}
