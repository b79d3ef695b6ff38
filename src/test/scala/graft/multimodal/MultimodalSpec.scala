package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("payload schema carries binary + typed metadata") {
    val df = Multimodal.withPayload(spark, sfDir)
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
  }

  test("mapPartitions decode stub yields features consistent with SQL path") {
    val typed = Multimodal.decodeFeatures(spark, sfDir).toDF()
    val sql = Multimodal.m1MediaFeatures(spark, sfDir)
    // same md5 + byte_len per doc from both the typed stub and the SQL path
    val joined = typed.as("a").join(sql.as("b"), "doc_id")
      .filter(col("a.content_md5") =!= col("b.content_md5") ||
              col("a.byte_len") =!= col("b.byte_len") ||
              col("a.n_frames") =!= col("b.n_frames"))
    assert(joined.isEmpty)
  }

  test("frame sampling covers every payload byte exactly once") {
    val frames = Multimodal.sampleFrames(spark, sfDir, frameBytes = 256)
    val total = frames.select(sum(length(col("frame_bytes")))).collect()(0).getLong(0)
    val expected = Multimodal.withPayload(spark, sfDir)
      .select(sum(length(col("payload")))).collect()(0).getLong(0)
    assert(total == expected)
  }

  test("metadata-only projection prunes the payload column at the scan") {
    val df = Multimodal.metadataOnly(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), plan)
  }

  test("overlapped windows: hop-spaced starts, full coverage, window-sized slices") {
    val win = 200; val hop = 100
    val wins = Multimodal.sampleWindows(spark, sfDir, win, hop).cache()
    val lens = Multimodal.withPayload(spark, sfDir)
      .select(col("doc_id"), length(col("payload")).as("len"))
    // per-doc window count matches the hop formula
    val counts = wins.groupBy("doc_id").count()
      .join(lens, "doc_id")
      .withColumn("expect",
        (greatest(col("len") - win, lit(0)) / hop).cast("long") + 1)
    assert(counts.filter(col("count") =!= col("expect")).isEmpty)
    // consecutive windows overlap by win - hop bytes
    val overlapViolation = wins.as("a").join(wins.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("a.win_idx") + 1 === col("b.win_idx"))
      .filter(length(col("a.win_bytes")) === win &&
        expr(s"substring(a.win_bytes, $hop + 1, $win - $hop) != substring(b.win_bytes, 1, $win - $hop)"))
    assert(overlapViolation.isEmpty)
    wins.unpersist(): Unit
  }
  test("batched encode (mapPartitions, one model call per batch) equals " +
       "the declarative stub embedding") {
    val s = spark
    import org.apache.spark.sql.functions._
    val batched = Multimodal.encodeBatched(s, sfDir, batchSize = 7)
      .select(col("doc_id"),
        concat_ws(",", col("embedding")).as("embedding_csv"))
    val declarative = Multimodal.m3EmbedPayload(s, sfDir)
      .select(col("doc_id"), col("embedding_csv"))
    assert(batched.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(batched).isEmpty)
  }

  test("m6: the aligned-encoder stub retrieves its true partner (recall@5 = 100%)") {
    // the per-dim noise bound (< 64 on 16-bit dims) keeps the true
    // pair's L2 distance at least an order of magnitude below a
    // random cross-doc distance, so the harness must report perfect
    // recall on the fixture — anything lower means the ranking join,
    // tie-break, or distance algebra regressed
    val r = Multimodal.m6CrossmodalRecall(spark, sfDir).head()
    assert(r.getAs[Long]("n_queries") > 0)
    assert(r.getAs[Long]("recall5_bp") === 10000L,
      s"recall@5 = ${r.getAs[Long]("recall5_bp")} bp")
  }

  test("m7 served from a persisted L2 AnnIndex equals the inline IVF row-for-row") {
    val idx = tmpDir("annindex-media")
    graft.sim.AnnIndex.buildFrom(
      Multimodal.m7MediaQuantized(spark, sfDir), idx, metric = graft.sim.AnnMetric.L2)
    val served = Multimodal.m7ServedFrom(spark, sfDir, idx).collect().toSeq
    val inline = Multimodal.m7CrossmodalIvf(spark, sfDir).collect().toSeq
    assert(served.nonEmpty && served.map(_.toSeq) == inline.map(_.toSeq))
    // and the true partner is actually found: same honesty columns
    assert(served.head.getAs[Long]("coverage_bp") > 0L)
  }

}
