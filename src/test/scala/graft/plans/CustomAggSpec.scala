package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TopKAggregator

class CustomAggSpec extends SparkSpec {

  test("ListAgg matches the built-in sort_array∘collect_set composition") {
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val native = orders.groupBy("o_custkey")
      .agg(ListAgg.listagg(col("o_orderpriority")).as("p"))
    val builtin = orders.groupBy("o_custkey")
      .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("p"))
    assert(native.exceptAll(builtin).isEmpty && builtin.exceptAll(native).isEmpty)
  }

  test("listagg is callable from SQL text via GraftExtensions") {
    // Sessions.local wires the extension; the shared test session may
    // predate it, so register into its FunctionRegistry the same way
    val s = spark
    s.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("listagg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ListAgg].getName, "listagg"),
      ListAgg.builder _)
    graft.core.Tables.load(s, sfDir, "orders").createOrReplaceTempView("orders")
    val df = s.sql(
      "SELECT o_custkey, listagg(o_orderpriority, '|') AS p FROM orders GROUP BY 1")
    val one = df.filter(col("o_custkey") === 1).collect()
    if (one.nonEmpty) assert(one(0).getString(1).split('|').toSeq.sorted ==
      one(0).getString(1).split('|').toSeq)
    assert(df.count() > 0)
  }

  test("MinKStrAggregator agrees with the window-function 2-rarest selection") {
    val s = spark
    import s.implicits._
    // shingle-df-shaped fixture with rank ties that must break on the
    // lexicographically smaller value, exactly like row_number over
    // (df asc, g asc)
    val rows = Seq(
      (1L, 5L, "zeta"), (1L, 1L, "beta"), (1L, 1L, "alpha"), (1L, 2L, "gamma"),
      (2L, 7L, "only"),
      (3L, 3L, "b"), (3L, 3L, "a"), (3L, 3L, "c"))
      .toDF("doc_id", "df", "g")
    val min2 = udaf(new graft.ops.MinKStrAggregator(2))
    val viaAgg = rows.groupBy("doc_id")
      .agg(min2(col("df"), col("g")).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("g"))
    val viaWindow = rows
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 2).select("doc_id", "g")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("TopKAggregator agrees with the window-function top-k") {
    val s = spark
    import s.implicits._
    val orders = graft.core.Tables.load(s, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    val viaAgg = orders.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "o_orderkey")))
      .select(col("o_custkey"), (col("i") + 1).as("rn"), col("o_orderkey"))
    val viaWindow = graft.queries.Registry.queries("q5_topk_window")(s, sfDir)
      .select(col("o_custkey"), col("rn").cast("int").as("rn"), col("o_orderkey"))
    // q5 orders by (price desc, orderkey asc); TopK ties break the same
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("TopKAggregator via functions.udaf matches the typed path and " +
       "plans an ObjectHashAggregate") {
    val s = spark
    val topk = udaf(new TopKAggregator(3))
    val viaUdaf = graft.core.Tables.load(s, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "o_orderkey")))
      .select(col("o_custkey"), (col("i") + 1).cast("int").as("rn"), col("o_orderkey"))
    val viaWindow = graft.queries.Registry.queries("q5_topk_window")(s, sfDir)
      .select(col("o_custkey"), col("rn").cast("int").as("rn"), col("o_orderkey"))
    assert(viaUdaf.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaUdaf).isEmpty)
    // relational path: the custom buffer aggregates with map-side
    // partials (partial_topkaggregator under an ObjectHashAggregate)
    val plan = graft.core.Tables.load(s, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topkaggregator"))
  }

  test("TopKAggregator reduce/merge match a reference sort under random " +
       "partition splits (property)") {
    import org.scalacheck.Gen
    val genRows: Gen[List[(Long, Double)]] = Gen.listOf(for {
      id <- Gen.choose(0L, 30L)            // small domain forces id ties
      score <- Gen.choose(0, 5).map(_.toDouble) // coarse scores force score ties
    } yield (id, score))
    val genCase = for {
      rows <- genRows
      k <- Gen.choose(1, 5)
      nSplits <- Gen.choose(1, 4)
    } yield (rows, k, nSplits)
    val cases = Iterator.continually(genCase.sample).flatten.take(200).toSeq
    for (((rows, k, nSplits), i) <- cases.zipWithIndex) {
      val agg = new TopKAggregator(k)
      // deterministic but arbitrary split into partitions
      val parts = rows.zipWithIndex.groupMap(_._2 % nSplits)(_._1).values.toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val want = rows.map { case (id, sc) => (sc, id) }
        .sortBy { case (sc, id) => (-sc, id) }.take(k).map(_._2)
      assert(got == want, s"case $i: rows=$rows k=$k splits=$nSplits")
    }
  }
}
