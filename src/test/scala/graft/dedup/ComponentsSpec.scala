package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  private lazy val ss = spark
  import ss.implicits._

  test("label propagation finds min-id components on chain + clique + pair") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
    ).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("durable (cluster-FS checkpoint) path yields identical labels") {
    // the durable seam must change WHERE round state lives (reliable
    // checkpoint dir, survives executor loss), never the labels
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      spark.sparkContext.setCheckpointDir(dir)
      val pairs = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (11L, 12L), (10L, 12L),
        (20L, 21L),
      ).toDF("doc_a", "doc_b")
      val local = Dedup.components(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val durable = Dedup.components(pairs, durable = true).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable == local)
      // round state actually landed in the reliable checkpoint dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
    }
  }

  test("d8 components are consistent with d3 pairs: endpoints share a component") {
    val pairs = Dedup.d3LshPairs(spark, sfDir)
    val comp = Dedup.components(pairs)
    val bad = pairs
      .join(comp.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("component", "ca"), "doc_a")
      .join(comp.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("component", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb"))
    assert(bad.isEmpty)
    // every component id is itself a member (the survivor exists)
    val ids = comp.select(col("component").as("cid")).distinct()
      .join(comp, col("cid") === col("doc_id"), "left_anti")
    assert(ids.isEmpty)
  }

  test("d9 semantic clusters cover exactly the vectors that appear in s4 pairs") {
    val pairs = graft.sim.Similarity.s4EmbeddingNeardup(spark, sfDir).cache()
    val clusters = Dedup.d9SemanticClusters(spark, sfDir).cache()
    val members = pairs.select(col("vec_a").as("v"))
      .union(pairs.select(col("vec_b").as("v"))).distinct()
    assert(clusters.count() == members.count())
    assert(clusters.join(members, col("vec_id") === col("v"), "left_anti").isEmpty)
    // exactly one survivor per component
    val perComp = clusters.filter(col("is_survivor"))
      .groupBy("component").count().filter(col("count") =!= 1)
    assert(perComp.isEmpty)
    pairs.unpersist(); clusters.unpersist(): Unit
  }
}
