package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val big = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val small = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", buckets = 4)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotKeys flags keys above the frequency threshold") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(50)(1L) ++ (2L to 20L)).toDF("k")
    val hot = SkewJoin.hotKeys(df, col("k"), frac = 0.5)
    assert(hot.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
