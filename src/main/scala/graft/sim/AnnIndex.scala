package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.LongArrayDot

/** Persisted IVF index lifecycle — the SERVING shape of s5/s6/s12:
  * build once, store as tables, answer query batches from the stored
  * index without touching raw embeddings again. The inline s-family
  * queries recompute centroids and assignments per run (right for the
  * oracle gate); a production retrieval tier amortizes that: the
  * index is a data artifact with its own build cadence, and query
  * traffic only ever reads it.
  *
  * Layout: `centroids` (one small parquet — broadcast at query time)
  * and `postings` PARTITIONED BY cell — a query batch that probes a
  * subset of cells prunes the postings scan to exactly those cells'
  * directories (dynamic partition pruning over the cell join; literal
  * cell predicates prune statically). That directory-level pruning is
  * the on-disk analogue of s5's cell-keyed join, and it is what makes
  * serving cost ∝ probed cells, not corpus size.
  *
  * Build rules are s5's exactly (same centroid election, same
  * integer-quantized vectors, same cosine tie-breaks); AnnIndexSpec
  * pins served-vs-inline parity row-for-row plus the pruning.
  */
object AnnIndex {

  /** Build the IVF index from the embeddings table into `indexDir`:
    * one corpus×centroids assignment pass (s5's), then postings are
    * laid out by cell. */
  def build(s: SparkSession, sfDir: String, indexDir: String): Unit =
    buildFrom(Similarity.quantized(s, sfDir), indexDir)

  /** Build from an explicit quantized corpus `(vec_id, label, qv,
    * n2)` — the corpus-subset entry point the append==rebuild
    * equivalence spec drives. */
  def buildFrom(corpus: DataFrame, indexDir: String): Unit = {
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("n2").as("c_n2"))
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/centroids")
    assign(corpus, centroids).write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/postings")
  }

  /** s5's assignment: each vector to its highest-cosine centroid,
    * ties to the smaller centroid id. */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    corpus.join(broadcast(centroids))
      .withColumn("c_cos", Similarity.cosine(
        LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("qv"), col("n2"),
        col("c_id").as("cell"))
  }

  /** Index maintenance: assign `newVectors` (quantized rows —
    * vec_id, label, qv, n2) into the EXISTING cells and append to
    * their posting partitions. Centroids are immutable under append
    * (the IVF contract: cell geometry changes only on rebuild), so an
    * appended index answers queries exactly as a rebuild over the
    * union would — provided the rebuild would elect the same
    * centroids (AnnIndexSpec pins that equivalence). Appends add one
    * file per touched cell per batch; `io/Compaction
    * .compactPartitions(_, s"$$indexDir/postings", "cell")` folds
    * them back to target-sized files without a shuffle, one bounded
    * partition-sized job at a time.
    */
  def append(s: SparkSession, indexDir: String, newVectors: DataFrame): Unit = {
    // append == rebuild only while the batch carries no
    // centroid-eligible ids (a rebuild over the union would elect a
    // different cell geometry). The precondition is cheap to CHECK —
    // one scan of the small batch — so violating batches fail loudly
    // here instead of silently diverging from a rebuild (round-8
    // advice).
    require(newVectors.filter(col("vec_id") % 125 === 0).isEmpty,
      "append batch contains centroid-eligible ids (vec_id % 125 == 0): " +
        "a rebuild would elect different cells — rebuild the index instead")
    val centroids = s.read.parquet(s"$indexDir/centroids")
    assign(newVectors, centroids).write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/postings")
  }

  /** Serve a query batch `(query_id, qv, n2)` from the stored index:
    * top-`k` neighbors per query by cosine, probing each query's
    * `nprobe` highest-cosine cells — the production recall/cost knob
    * (nprobe=1 is s5's plan, nprobe=2 reproduces s6's multiprobe;
    * candidates stay duplicate-free across probed cells because each
    * vector lives in exactly one cell). Serving cost ∝ nprobe ×
    * cell size: the postings scan prunes to exactly the probed
    * cells' directories regardless of the knob.
    */
  def query(s: SparkSession, indexDir: String, queries: DataFrame,
            k: Int, nprobe: Int = 1): DataFrame = {
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val postings = s.read.parquet(s"$indexDir/postings")
    val wProbe = Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("c_id"))
    val probed = queries.join(broadcast(centroids))
      .withColumn("c_cos", Similarity.cosine(
        LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"),
        col("c_id").as("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    probed.join(postings, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", Similarity.cosine(
        LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
  }
}
