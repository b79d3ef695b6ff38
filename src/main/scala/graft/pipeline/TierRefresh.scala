package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The nightly tier-refresh DAG — the reference's tiered-ETL cascade
  * (`Airflow_week.py:247-276`: T1→T5 jobs refresh derived tables in
  * dependency order under one scheduled run, each audit-logged)
  * applied to the engine's standing tiers.
  *
  * Every job body just SERVES its tier: [[graft.io.DerivedStore]]'s
  * fingerprint check makes the serve a no-op when the sources haven't
  * moved, an O(Δ) merge on append-only drift, and a full rebuild
  * otherwise — so this DAG is idempotent (re-running a green night
  * re-publishes nothing) and the nightly cost is proportional to what
  * actually changed, never to history. Dependencies express refresh
  * order for the tiers that COMPOSE (the band index builds from the
  * shingle tier; the lexical components merge probes the band index;
  * the serves would re-enter and refresh upstreams themselves, but
  * ordering them makes each job's run-log row carry its OWN cost and
  * an upstream failure SKIP its dependents instead of failing them
  * mid-build).
  *
  * Row counts feed the A4 count gate through [[Pipeline.run]]'s
  * run-log (one row per tier per night, success/failure/skip alike);
  * `TierRefreshSpec` pins the all-green night, the no-op re-run, and
  * the drift night refreshing exactly the touched lineage.
  */
object TierRefresh {

  import Pipeline.Job

  /** One job per standing tier, dependency-ordered. */
  def jobs(sfDir: String): Seq[Job] = Seq(
    Job("tokens_tier", "graphstore.tokens")((s, _) =>
      graft.text.TokenStore.served(s, sfDir).count()),
    Job("shingle_tier", "graphstore.shingles")((s, _) =>
      graft.dedup.ShingleStore.served(s, sfDir).count()),
    Job("band_index_tier", "graphstore.band_index",
      deps = Seq("shingle_tier"))((s, _) =>
      graft.dedup.BandIndexStore.corpusIndex(s, sfDir).count()),
    Job("lsh_components_tier", "graphstore.lsh_components",
      deps = Seq("band_index_tier"))((s, _) =>
      graft.dedup.ClusterStore.lshComponents(s, sfDir).count()),
    Job("emb_components_tier", "graphstore.emb_components")((s, _) =>
      graft.dedup.ClusterStore.embComponents(s, sfDir).count()),
    Job("pq_index_tier", "graphstore.pq_index")((s, _) =>
      s.read.parquet(s"${graft.sim.Similarity.s12Index(s, sfDir)}/codes").count()),
    Job("media_ann_tier", "graphstore.media_ann")((s, _) =>
      s.read.parquet(s"${graft.multimodal.Multimodal.m7Index(s, sfDir)}/postings").count()),
    Job("purchase_tier", "graphstore.purchase")((s, _) =>
      graft.io.GraphStore.purchaseEdges(s, sfDir).count()),
    Job("cosupply_tier", "graphstore.cosupply")((s, _) =>
      graft.io.GraphStore.cosupplyUnd(s, sfDir).count()),
  )

  /** Run the refresh for one batch date; results + run-log rows. */
  def refresh(spark: SparkSession, sfDir: String,
              batDt: java.time.LocalDate,
              runLogPath: String): Seq[Pipeline.Result] =
    Pipeline.run(spark, jobs(sfDir), batDt, runLogPath)
}
