package graft.core

import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests (SURVEY §5): schema-utility totality and env parsing
  * over generated inputs. Raw scalacheck `Gen` sampled in a loop — the
  * scalatest bridge artifact isn't in the offline cache.
  */
class PropertySpec extends SparkSpec {

  private val genField: Gen[StructField] = for {
    name <- Gen.identifier.map(_.take(8))
    dt <- Gen.oneOf[DataType](StringType, IntegerType, LongType, DoubleType,
      BooleanType, DateType, TimestampType)
    nullable <- Gen.oneOf(true, false)
  } yield StructField(name, dt, nullable)

  private val genSchema: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    fields <- Gen.listOfN(n, genField)
  } yield StructType(fields.distinctBy(_.name))

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("relaxNullability is total, idempotent, and only flips nullability") {
    for (schema <- samples(genSchema)) {
      val r = SchemaUtil.relaxNullability(schema)
      assert(r.fields.forall(_.nullable), schema)
      assert(SchemaUtil.relaxNullability(r) == r, schema)
      assert(r.fieldNames.toSeq == schema.fieldNames.toSeq, schema)
      assert(r.fields.map(_.dataType).toSeq == schema.fields.map(_.dataType).toSeq)
    }
  }

  test("diffColumns is anti-symmetric and empty on self") {
    for ((a, b) <- samples(genSchema).zip(samples(genSchema))) {
      val (onlyA, onlyB) = SchemaUtil.diffColumns(a, b)
      val (onlyB2, onlyA2) = SchemaUtil.diffColumns(b, a)
      assert(onlyA == onlyA2 && onlyB == onlyB2)
      assert(SchemaUtil.diffColumns(a, a) == (Seq.empty, Seq.empty))
    }
  }

  test("KMinAgg: split-and-merge equals whole-input compute (sketch mergeability)") {
    val agg = new graft.functions.KMV.KMinAgg(8)
    val genVals = Gen.listOf(Gen.choose(0L, 1000L))
    samples(Gen.zip(genVals, genVals), 200).foreach { case (xs, ys) =>
      def fold(vs: Seq[Long]) = vs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.finish(agg.merge(fold(xs), fold(ys)))
      val whole = agg.finish(fold(xs ++ ys))
      assert(merged == whole, s"$xs / $ys")
      assert(whole == (xs ++ ys).distinct.sorted.take(8))
    }
  }

  test("zValue interleaves bits: monotone in each dimension over aligned pairs") {
    val s = spark
    import s.implicits._
    val pts = samples(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)), 64)
    val df = pts.toDF("x", "y")
      .withColumn("z", graft.io.SortedLayout.zValue(
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // bit-interleaving identity: z == sum of spread bits
    df.foreach { case ((x, y), z) =>
      val expect = (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
      assert(z == expect, s"($x,$y)")
    }
  }

  test("parseJobName accepts exactly the known envs") {
    for (base <- samples(Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty), 25)) {
      for (env <- EnvConfig.KnownEnvs)
        assert(EnvConfig.parseJobName(s"${base}_$env") == (base, env))
      intercept[IllegalArgumentException] { EnvConfig.parseJobName(s"${base}_qa") }
      intercept[IllegalArgumentException] { EnvConfig.parseJobName(base) }
    }
  }
}
