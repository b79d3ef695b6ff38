package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the round-6-advice semantics the DuckDB gate can NEVER catch:
  * an engine that silently drops an empty group agrees with an oracle
  * written the same way, so the "fully consumed" rows — a fully
  * mirrored source (c17), an all-boilerplate document (d25), a
  * singleton-cell vector (s16) — must be pinned by fixture, not by
  * parity. Each case builds the exact degenerate input the advice
  * described and asserts the row SURVIVES with zeroed measures.
  */
class EmptyGroupVisibilitySpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[Row], withSource: Boolean): Unit = {
    val fields = Seq(StructField("doc_id", LongType), StructField("text", StringType)) ++
      (if (withSource) Seq(StructField("source", StringType)) else Nil)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), StructType(fields))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("c17: a fully mirrored source reports kept_docs=0 / weight_bp=0, not absence") {
    val dir = tmpDir("c17-mirror")
    // srcB's every doc is a verbatim copy of an srcA doc with a HIGHER
    // doc_id: min-doc_id survivorship reattributes both clusters to
    // srcA, so srcB keeps nothing — the row IS the finding.
    writeDocs(dir, Seq(
      Row(1L, "alpha beta gamma", "srcA"),
      Row(2L, "delta epsilon zeta", "srcA"),
      Row(3L, "eta theta iota", "srcA"),
      Row(10L, "alpha beta gamma", "srcB"),
      Row(11L, "delta epsilon zeta", "srcB")), withSource = true)
    val out = graft.corpus.Corpus.c17EffectiveMix(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("srcA", "srcB"))
    val b = out("srcB")
    assert(b.getAs[Long]("raw_docs") == 2L)
    assert(b.getAs[Long]("kept_docs") == 0L)
    assert(b.getAs[Long]("kept_tokens") == 0L)
    assert(b.getAs[Long]("weight_bp") == 0L)
    val a = out("srcA")
    assert(a.getAs[Long]("kept_docs") == 3L)
    assert(a.getAs[Long]("weight_bp") == 10000L)
  }

  test("d25: an all-boilerplate document survives as an emptied row") {
    val dir = tmpDir("d25-boiler")
    // 10 docs: nine carry a unique chunk + the shared 3-token chunk
    // (df=10 ≥ greatest(2, 10 div 64) → boilerplate); doc 100 is ONLY
    // the shared chunk, so the strip consumes it entirely.
    val rows = (1L to 9L).map(i =>
      Row(i, s"u${i}a u${i}b u${i}c bp1 bp2 bp3")) :+
      Row(100L, "bp1 bp2 bp3")
    writeDocs(dir, rows, withSource = false)
    val out = graft.dedup.Dedup.d25BoilerplateStrip(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 10, s"transform must not lose documents: ${out.keySet}")
    val emptied = out(100L)
    assert(emptied.getAs[String]("clean_text") == "")
    assert(emptied.getAs[Long]("chunks_kept") == 0L)
    assert(emptied.getAs[Long]("chunks_total") == 1L)
    // the others keep exactly their unique chunk
    (1L to 9L).foreach { i =>
      assert(out(i).getAs[Long]("chunks_kept") == 1L)
      assert(out(i).getAs[String]("clean_text") == s"u${i}a u${i}b u${i}c")
    }
  }

  test("s16: a vector alone in its IVF cell emits n_neighbors=0, suspect") {
    val dir = tmpDir("s16-singleton")
    // Centroids are vec_id % 125 == 0 → vecs 0 and 125. Vectors 0-3
    // hug axis e1 (cell of centroid 0); vec 125 is axis e2 and lands
    // alone in its own cell — the isolated row the audit must surface.
    def vec(axis: Int, wobble: Int): Seq[Float] =
      (0 until 64).map(d =>
        if (d == axis) 1.0f
        else if (d == 63) wobble * 0.001f
        else 0.0f)
    val rows = Seq(
      Row(0L, vec(0, 0), 1),
      Row(1L, vec(0, 1), 1),
      Row(2L, vec(0, 2), 1),
      Row(3L, vec(0, 3), 2),
      Row(125L, vec(1, 0), 2))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.sim.Similarity.s16LabelAudit(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 125L),
      s"audit must cover every labeled vector: ${out.keySet}")
    val lone = out(125L)
    assert(lone.getAs[Long]("n_neighbors") == 0L)
    assert(lone.getAs[Long]("agree5") == 0L)
    assert(lone.getAs[Boolean]("suspect"))
    // the clustered vectors do have neighbors
    assert(out(0L).getAs[Long]("n_neighbors") == 3L)
  }

  test("q98: a missing audience yields an empty sketch, not an empty report") {
    val dir = tmpDir("q98-oneside")
    // only 'view' events — no purchasers at all. The report row must
    // survive: the global sketch aggregate always emits its row, the
    // absent side coalesces to an empty array, and the estimates
    // degenerate to the exact view count / zero intersection.
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("user_id", LongType),
      StructField("ts", TimestampType))) // Tables.load normalizes ts
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val rows = (1L to 5L).map(u => Row("view", u, t0)) :+ Row("click", 99L, t0)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.functions.KMV.q98KmvSetops(spark, dir).collect()
    assert(r.length == 1, "report row must survive a missing audience")
    assert(r(0).getAs[Long]("exact_union") == 5L)
    assert(r(0).getAs[Long]("exact_intersect") == 0L)
    assert(r(0).getAs[Double]("union_est") == 5.0) // m < k branch: exact
    assert(r(0).getAs[Double]("intersect_est") == 0.0)
  }
}
