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

  test("AQE runtime skew split fires on a synthetic hot key (plan shows skew=true)") {
    // PLANS.md claims q2-family joins degrade gracefully at 100 TB
    // because AQE splits skewed partitions at runtime; this pins that
    // claim to an executed plan instead of an assertion. Thresholds
    // are lowered so the default 256 MB trigger scales down to a
    // fixture-sized hot partition; the mechanism under test is the
    // same OptimizeSkewedJoin rule production would run.
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val payload = "x" * 64
      // 50k rows of key 1 vs a uniform tail: one shuffle partition
      // dwarfs the median by far more than the 2x factor
      val big = ((1 to 50000).map(_ => 1L) ++ (2L to 2000L))
        .toDF("k").withColumn("payload", lit(payload))
      val dim = (1L to 2000L).toDF("k").withColumn("v", col("k") * 2)
      val joined = big.join(dim, "k")
      // collect() executes THIS df's QueryExecution — count() would
      // spawn its own and leave joined's adaptive plan unfinalized
      assert(joined.collect().length == 50000 + 1999)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("hotKeys flags keys above the frequency threshold") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(50)(1L) ++ (2L to 20L)).toDF("k")
    val hot = SkewJoin.hotKeys(df, col("k"), frac = 0.5)
    assert(hot.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
