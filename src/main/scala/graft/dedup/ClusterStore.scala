package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.DerivedStore

/** Materialized dup-cluster tier — the GraphStore/TokenStore
  * build-once pattern applied to the dedup family's most expensive
  * shared intermediate: CONNECTED-COMPONENT labels.
  *
  * `Dedup.components` is a convergence loop with a driver action per
  * round — precisely the computation a pipeline should pay once per
  * corpus snapshot, not once per consumer. Two tiers:
  *
  *  - `lsh`: components over the d3 MinHash-LSH candidate pairs —
  *    the lexical dup-cluster labels (doc_id, component), consumed by
  *    d8 (cluster readout), d10 (survivorship election) and d22
  *    (cluster agreement).
  *  - `emb`: components over the s4 embedding near-dup pairs — the
  *    semantic cluster labels, consumed by d9 and d22.
  *
  * Labels cover only docs that appear in ≥1 candidate pair
  * (singletons are their own implicit cluster — every consumer
  * already handles that via anti-join/coalesce, and materializing
  * corpus-sized identity rows would bloat the tier for no reader).
  *
  * Freshness/atomicity ride [[DerivedStore]]: fingerprint-keyed
  * rebuild on source drift, staged OCC versioned publish. Layout is
  * range-sorted on doc_id so per-file stats prune doc-keyed lookups
  * ("which cluster is this doc in" serves from one file).
  *
  * The inline forms remain the ground truth (`ClusterStoreSpec` pins
  * served == inline row-equal), and the DuckDB oracles still compute
  * components independently from the raw tables — the three-gate hash
  * check re-proves tier == inline on every Verify run.
  */
object ClusterStore {

  /** Inline ground truth: components over d3's LSH candidate pairs.
    * Columns: doc_id, component. */
  def lshComponentsInline(s: SparkSession, dir: String): DataFrame =
    Dedup.components(Dedup.d3LshPairs(s, dir))

  /** Inline ground truth: components over s4's embedding near-dup
    * pairs. Columns: doc_id, component. */
  def embComponentsInline(s: SparkSession, dir: String): DataFrame =
    Dedup.components(graft.sim.Similarity.s4EmbeddingNeardup(s, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))

  /** Store-served lexical dup-cluster labels. */
  def lshComponents(s: SparkSession, dir: String): DataFrame =
    DerivedStore.served(s, dir, "lsh_components", Seq("documents"),
      lshComponentsInline, numFiles = 4, sortKey = "doc_id")

  /** Store-served semantic cluster labels. */
  def embComponents(s: SparkSession, dir: String): DataFrame =
    DerivedStore.served(s, dir, "emb_components", Seq("embeddings"),
      embComponentsInline, numFiles = 4, sortKey = "doc_id")
}
