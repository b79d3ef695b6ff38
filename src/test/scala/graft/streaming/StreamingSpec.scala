package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def eventsSchema = graft.core.Tables.load(spark, sfDir, "events").schema

  /** Write the sf0.001 events as JSON micro-batch input files. */
  private def stageInput(dir: String, n: Int): Long = {
    val src = graft.core.Tables.load(spark, sfDir, "events").limit(n)
    src.coalesce(2).write.mode("overwrite").json(dir)
    src.count()
  }

  test("file ingest is exactly-once across restarts and replays") {
    val base = tmpDir("stream")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val staged = stageInput(in, 500)

    // events.json loses the ts type; read schema comes from the parquet frame
    val schema = graft.core.Tables.load(spark, sfDir, "events").schema
    val q1 = ExactlyOnce.fileIngest(spark, in, schema, out, ckpt)
    q1.awaitTermination()
    val firstCount = spark.read.parquet(out).count()
    assert(firstCount == staged)

    // restart with the same checkpoint: nothing reprocessed, no dupes
    val q2 = ExactlyOnce.fileIngest(spark, in, schema, out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == staged)

    // fresh checkpoint (a crash-replay of already-written batches):
    // the idempotent partition sink absorbs the replay — still no dupes
    val q3 = ExactlyOnce.fileIngest(spark, in, schema, out, s"$base/ckpt2")
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() == staged)
  }

  test("kill-mid-batch: view merged but checkpoint uncommitted replays as a no-op") {
    // THE exactly-once crash window: the foreachBatch body completes
    // (view data + ledger swapped in atomically by AggView) but the
    // query dies before Structured Streaming commits the batch to its
    // checkpoint. On restart the source replays the SAME batch id over
    // the SAME offset range; the co-committed ledger must turn that
    // replay into a no-op or the view double-counts.
    val s = spark
    import s.implicits._
    val base = tmpDir("crash")
    val in = s"$base/in"; val view = s"$base/view"; val ckpt = s"$base/ckpt"
    Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").json(in)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    val crash = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = s.readStream.schema(schema).json(in)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.io.AggView.mergeBatch(s, view, id, df,
          Seq("k"), Seq("total" -> sum(col("v")))): Unit
        if (crash.get)
          throw new RuntimeException("injected crash: after view swap, before checkpoint commit")
      }
      .start()

    intercept[Exception] { val q1 = start(); q1.awaitTermination() }
    // the batch DID apply - data and ledger moved together pre-crash
    def totals = graft.io.AggView.read(s, view).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == Map("a" -> 3L, "b" -> 5L))
    assert(graft.io.AggView.ledger(s, view) == Set("batch=0"))

    // restart: batch 0 replays over the same offsets and must no-op
    crash.set(false)
    val q2 = start(); q2.awaitTermination()
    assert(totals == Map("a" -> 3L, "b" -> 5L))
    assert(graft.io.AggView.ledger(s, view) == Set("batch=0"))

    // new data after recovery still flows: the ledger gates batch ids,
    // not progress
    Seq(("b", 7L)).toDF("k", "v").coalesce(1).write.mode("append").json(in)
    val q3 = start(); q3.awaitTermination()
    assert(totals == Map("a" -> 3L, "b" -> 12L))
  }

  test("windowed counts with watermark aggregate per hour and type") {
    val events = graft.core.Tables.load(spark, sfDir, "events")
    val agg = ExactlyOnce.windowedCounts(events)
    val total = agg.agg(sum("n")).collect()(0).getLong(0)
    assert(total == events.count())
    // every (window, type) group is unique
    assert(agg.groupBy("window_start", "event_type").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("streaming dedup drops repeats within the watermark across batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp)](s)
    val q = mem.toDS().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def at(m: Long) = new java.sql.Timestamp(t0.getTime + m * 60000)
      mem.addData((1L, at(0)), (1L, at(1)), (2L, at(2)))
      q.processAllAvailable()
      mem.addData((1L, at(3)), (2L, at(4)), (3L, at(5))) // dupes within watermark
      q.processAllAvailable()
      val ids = s.sql("SELECT id FROM dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches each micro-batch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // static dim (the `nation`-style lookup): event_type -> category.
    // At scale the dim is broadcast once and re-used every micro-batch;
    // no stream-side shuffle.
    val dim = Seq(("click", "engage"), ("view", "engage"), ("error", "ops"))
      .toDF("event_type", "category")
    val mem = MemoryStream[(Long, String)](s)
    val q = mem.toDS().toDF("event_id", "event_type")
      .join(broadcast(dim), Seq("event_type"), "left_outer")
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "click"), (2L, "error"), (3L, "purchase"))
      q.processAllAvailable()
      val got = s.sql("SELECT event_id, category FROM enriched_out")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("engage"), 2L -> Some("ops"), 3L -> None))
    } finally q.stop()
  }

  test("kafka source/sink option surface compiles and declares kafka format") {
    // no broker in the sandbox: assert construction fails only at
    // connection time, i.e. the plan carries the kafka source
    val ex = intercept[Exception] {
      ExactlyOnce.kafkaSource(spark, "localhost:19092", "t").collect()
    }
    assert(Option(ex.getMessage).nonEmpty)
    assert(Files.exists(Paths.get("/opt/spark/jars")))
  }
}
