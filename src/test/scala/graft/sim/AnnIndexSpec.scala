package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.TestSession.sfDir

/** Contract pins for the persisted IVF index:
  *  - serve parity: build + query from the stored index reproduces
  *    s5's inline IVF results row-for-row (same centroid election,
  *    quantization, and tie-breaks — the index is a materialization,
  *    not a different algorithm);
  *  - the layout earns its keep: postings are partitioned by cell,
  *    and a cell predicate prunes the scan to that cell's directory
  *    (PartitionFilters, not a full scan + post-filter).
  */
class AnnIndexSpec extends SparkSpec {

  test("stored-index serving equals s5's inline IVF row-for-row") {
    val s = spark
    val dir = tmpDir("annindex")
    AnnIndex.build(s, sfDir, dir)
    val queries = Similarity.quantized(s, sfDir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv"), col("n2"))
    val served = AnnIndex.query(s, dir, queries, 3).collect().toSet
    val inline = graft.queries.Registry.queries("s5_ivf_ann")(s, sfDir)
      .collect().toSet
    assert(served.nonEmpty && served == inline)
  }

  test("nprobe=2 serving equals s6's inline multiprobe row-for-row") {
    val s = spark
    val dir = tmpDir("annindex-np2")
    AnnIndex.build(s, sfDir, dir)
    val queries = Similarity.quantized(s, sfDir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv"), col("n2"))
    val served = AnnIndex.query(s, dir, queries, 3, nprobe = 2)
      .drop("cell").collect().toSet
    val inline = graft.queries.Registry.queries("s6_multiprobe_ann")(s, sfDir)
      .collect().toSet
    assert(served.nonEmpty && served == inline)
  }

  test("append == rebuild: incremental postings and serving match the full build") {
    val s = spark
    val full = Similarity.quantized(s, sfDir)
    // the delta slice holds NO centroid ids (125k mod 10 ∈ {0,5}, never
    // 3), so the full rebuild elects exactly the base build's centroids
    // — the precondition under which append must equal rebuild
    val base = full.filter(col("vec_id") % 10 =!= 3)
    val delta = full.filter(col("vec_id") % 10 === 3)
    val dirFull = tmpDir("annindex-full")
    val dirInc = tmpDir("annindex-inc")
    AnnIndex.buildFrom(full, dirFull)
    AnnIndex.buildFrom(base, dirInc)
    AnnIndex.append(s, dirInc, delta)
    def postings(d: String) =
      s.read.parquet(s"$d/postings").collect().toSet
    assert(postings(dirInc) == postings(dirFull))
    val queries = full.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv"), col("n2"))
    def serve(d: String) =
      AnnIndex.query(s, d, queries, 3, nprobe = 2).collect().toSet
    assert(serve(dirInc).nonEmpty && serve(dirInc) == serve(dirFull))
    // maintenance: appends left extra files per touched cell; the
    // partition-preserving compaction folds them back and changes
    // neither postings nor serving
    def nFiles(d: String) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, "postings"))
        .filter(p => p.toString.endsWith(".parquet")).count()
    val before = nFiles(dirInc)
    graft.io.Compaction.compactPartitions(s, s"$dirInc/postings", "cell"): Unit
    assert(nFiles(dirInc) < before)
    assert(postings(dirInc) == postings(dirFull))
    assert(serve(dirInc) == serve(dirFull))
    // a batch carrying a centroid-eligible id breaks the append ==
    // rebuild equivalence (different cell geometry on rebuild) — it
    // must be rejected loudly, not silently assigned (round-8 advice)
    intercept[IllegalArgumentException] {
      AnnIndex.append(s, dirInc, full.filter(col("vec_id") % 125 === 0).limit(1))
    }
    assert(postings(dirInc) == postings(dirFull),
      "a rejected append must leave the index untouched")
  }

  test("L2 media index: marker round-trips, serving ranks ascending by exact dist2") {
    val s = spark
    val media = graft.multimodal.Multimodal.m7MediaQuantized(s, sfDir)
    val dir = tmpDir("annindex-l2")
    AnnIndex.buildFrom(media, dir, metric = AnnMetric.L2)
    assert(AnnIndex.metricOf(s, dir) == AnnMetric.L2)
    val queries = graft.multimodal.Multimodal.m7QueriesQuantized(s, sfDir)
      .select("query_id", "qv", "n2")
    val served = AnnIndex.query(s, dir, queries, k = 5, nprobe = 2,
      excludeSelf = false)
    assert(served.count() > 0)
    // ascending within each query: rank r's dist2 <= rank r+1's
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val bad = served.withColumn("nxt", lead(col("dist2"), 1).over(w))
      .filter(col("nxt").isNotNull && col("dist2") > col("nxt"))
    assert(bad.isEmpty, "L2 ranks must be ascending in dist2")
    // the same-id media row is the planted nearest partner: with
    // excludeSelf=false it must dominate rank 1 whenever its cell was
    // probed (coverage pinned > 0 in MultimodalSpec)
    val self = served.filter(col("rank") === 1 &&
      col("neighbor_id") === col("query_id"))
    assert(self.count() > 0)
  }

  test("cell predicate prunes the postings scan to one partition") {
    val s = spark
    val dir = tmpDir("annindex2")
    AnnIndex.build(s, sfDir, dir)
    val postings = s.read.parquet(s"$dir/postings")
    // partition-directory values read back as int: normalize
    val cells = postings.select("cell").distinct().collect()
      .map(_.getAs[Number](0).longValue)
    assert(cells.length > 1, "need several cells for pruning to mean anything")
    val one = postings.filter(col("cell") === cells.min)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell#"),
      s"cell filter did not reach partition pruning:\n$plan")
    // the pruned scan returns exactly that cell's postings
    val expected = postings.collect()
      .count(_.getAs[Number]("cell").longValue == cells.min)
    assert(one.count() == expected)
  }

  test("s12 served from the snapshot PQ index equals the inline IVF+PQ row-for-row") {
    val prevRoot = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("pqindex-store")
    try {
      val served = Similarity.s12IvfPqServed(spark, sfDir).collect().toSeq
      val inline = Similarity.s12IvfPq(spark, sfDir).collect().toSeq
      assert(served.nonEmpty && served.map(_.toSeq).toSet == inline.map(_.toSeq).toSet)
    } finally prevRoot match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }
}
