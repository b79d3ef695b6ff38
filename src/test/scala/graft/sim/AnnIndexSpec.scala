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
}
