package graft.io

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Contract pins for the versioned schema registry:
  *  - additive nullable evolution registers and version-chains;
  *  - removed columns, type changes, and non-nullable additions are
  *    rejected against EVERY prior version, not just the latest;
  *  - identical re-registration is idempotent (no duplicate version);
  *  - registered schemas actually read old data (the BACKWARD claim,
  *    exercised through a real parquet round-trip).
  */
class SchemaRegistrySpec extends SparkSpec {

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType)))
  private val v2 = StructType(v1.fields :+ StructField("score", DoubleType))

  test("additive nullable evolution chains versions; idempotent re-register") {
    val dir = tmpDir("schreg")
    assert(SchemaRegistry.register(dir, v1) == 1)
    assert(SchemaRegistry.register(dir, v1) == 1) // idempotent
    assert(SchemaRegistry.register(dir, v2) == 2)
    assert(SchemaRegistry.versions(dir) == Seq(1, 2))
    assert(SchemaRegistry.schemaAt(dir, 1) == v1)
    assert(SchemaRegistry.latest(dir).map(_._2).contains(v2))
  }

  test("removal, type change, and non-nullable addition are rejected vs ALL priors") {
    val dir = tmpDir("schreg2")
    SchemaRegistry.register(dir, v1)
    SchemaRegistry.register(dir, v2)
    def rejects(s: StructType, kind: String): Unit = {
      val e = intercept[IllegalArgumentException](SchemaRegistry.register(dir, s))
      assert(e.getMessage.contains(kind), e.getMessage)
      assert(SchemaRegistry.versions(dir) == Seq(1, 2)) // nothing minted
    }
    rejects(StructType(Seq(StructField("id", LongType, nullable = false))),
      "removed-column")
    rejects(StructType(v2.fields.map(f =>
      if (f.name == "score") f.copy(dataType = StringType) else f)),
      "type-changed")
    // drops "score" vs v2 even though it is additive vs v1
    rejects(StructType(v1.fields :+ StructField("extra", LongType, nullable = false)),
      "removed-column")
    rejects(StructType(v2.fields :+ StructField("extra", LongType, nullable = false)),
      "added-non-nullable")
    // tightening an EXISTING nullable column to non-nullable: old files
    // may contain nulls the new reader schema forbids
    rejects(StructType(v2.fields.map(f =>
      if (f.name == "name") f.copy(nullable = false) else f)),
      "nullability-tightened")
  }

  test("a registered evolution reads data written under the prior version") {
    val s = spark
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("schreg3")
    val data = tmpDir("schreg3_data")
    SchemaRegistry.register(dir, v1)
    s.createDataFrame(
      Seq(org.apache.spark.sql.Row(1L, "a"), org.apache.spark.sql.Row(2L, "b")).asJava, v1)
      .write.mode("overwrite").parquet(data)
    val v = SchemaRegistry.register(dir, v2)
    val evolved = SchemaRegistry.schemaAt(dir, v)
    val back = s.read.schema(evolved).parquet(data)
    assert(back.count() == 2)
    assert(back.filter(back("score").isNull).count() == 2) // old rows: null
  }
}
