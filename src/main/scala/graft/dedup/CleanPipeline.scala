package graft.dedup

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{AtomicPublish, RunLog}

/** The full corpus clean as ONE composed production job — the
  * composition a user actually runs, where d1/d3/d11/d8/d10 are the
  * unit-testable stages:
  *
  *   exact dedup → MinHash-LSH candidates → exact-Jaccard
  *   verification → connected components → quality survivorship →
  *   atomically-published canonical corpus + audit row.
  *
  * Unlike the per-query registry entries (each of which recomputes
  * its inputs so the oracle can check it in isolation), the stages
  * here SHARE one shingled materialization, and each stage's input is
  * the previous stage's survivors — exact copies never reach the
  * (more expensive) fuzzy pass.
  *
  * Scale shape: 1 shuffle for exact dedup (content hash), 1 for LSH
  * banding, 1 shingle-keyed shuffle for verification,
  * O(cluster-diameter) node-keyed shuffles for components, and the
  * members-only survivorship window (d10's singleton split). The
  * publish is staging + O(1) rename behind a count gate; the run-log
  * row lands on success AND failure paths (K6 contract).
  */
object CleanPipeline {

  /** Per-stage accounting, returned AND logged. */
  case class Report(
      nInput: Long,
      nExactDropped: Long,
      nCandidatePairs: Long,
      nVerifiedPairs: Long,
      nClusterDropped: Long,
      nFinal: Long)

  private val JaccardThreshold = 0.5

  /** @param durableComponents route the components loop's lineage
    *   truncation through the session's cluster-FS checkpoint dir
    *   (`Dedup.components(durable = true)`) — the right setting for a
    *   real cluster run, where an hours-long clean must survive
    *   executor loss mid-loop; default keeps the fast local path.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          logPath: String, jobRunId: String = "clean-1",
          durableComponents: Boolean = false): Report = {
    val t0 = System.currentTimeMillis()
    // every persist() registers here and unpersists in the finally:
    // the failure path must not leak cached blocks into a long-lived
    // session (LEAKCHECK tracks exactly this)
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = { cached += df.persist(); df }
    try {
      val docs = graft.core.Tables.loadParallel(spark, sfDir, "documents")

      // 1. exact dedup: keep min doc_id per normalized content hash
      val keyed = docs.withColumn("content_hash",
        md5(regexp_replace(lower(trim(col("text"))), " +", " ")))
      val keep = keyed.groupBy("content_hash")
        .agg(min("doc_id").as("keep_id"))
      val exactSurvivors = keyed
        .join(keep, keyed("content_hash") === keep("content_hash") &&
          keyed("doc_id") === keep("keep_id"), "left_semi")
        .drop("content_hash")

      // 2-3. shingle ONCE; LSH candidates over exact survivors only
      val shingled = cache(Dedup.withShingles(exactSurvivors)
        .select(col("doc_id"), col("n_chars"), col("shingles")))
      val pairs = Dedup.lshPairsOf(Dedup.signaturesOf(shingled))

      // 4. verify candidates with exact Jaccard over the SAME shingles
      val sh = shingled.select(col("doc_id"), explode(col("shingles")).as("g"))
      val counts = shingled.select(col("doc_id"), size(col("shingles")).as("nsh"))
      val verified = cache(pairs
        .join(sh.as("sa"), pairs("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"),
          pairs("doc_b") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .filter(col("shared") /
          (col("ca.nsh") + col("cb.nsh") - col("shared")) >= JaccardThreshold)
        .select("doc_a", "doc_b"))

      // 5. components over verified pairs; 6. elect by quality
      val comp = cache(Dedup.components(verified, durable = durableComponents))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("component")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val clusterKeep = shingled.select("doc_id", "n_chars")
        .join(comp, Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("doc_id")
      val clusterMembers = comp.select("doc_id")
      val canonical = exactSurvivors
        .join(clusterMembers, Seq("doc_id"), "left_anti")
        .unionByName(exactSurvivors.join(clusterKeep, Seq("doc_id"), "left_semi"))

      // 7. counts + atomic publish + audit row
      val nInput = docs.count()
      val nExact = exactSurvivors.count()
      val nPairs = pairs.count()
      val nVerified = verified.count()
      val nFinal = canonical.count()
      val report = Report(nInput, nInput - nExact, nPairs, nVerified,
        nExact - nFinal, nFinal)

      AtomicPublish.publish(canonical, outDir, expectedRows = Some(nFinal))
      RunLog.append(spark, logPath, RunLog.Entry(
        bat_dt = new java.text.SimpleDateFormat("yyyyMMdd").format(t0),
        bat_req_tm = t0.toString,
        job_nm = "corpus_clean",
        taget_tbl_nm = outDir,
        cretn_cnt = nFinal,
        success_yn = "Y",
        error_msg = "",
        job_run_id = jobRunId,
        platform_dt = new Timestamp(System.currentTimeMillis())))
      report
    } catch {
      case e: Throwable =>
        RunLog.append(spark, logPath, RunLog.Entry(
          bat_dt = new java.text.SimpleDateFormat("yyyyMMdd").format(t0),
          bat_req_tm = t0.toString,
          job_nm = "corpus_clean",
          taget_tbl_nm = outDir,
          cretn_cnt = 0L,
          success_yn = "N",
          error_msg = String.valueOf(e.getMessage).take(500),
          job_run_id = jobRunId,
          platform_dt = new Timestamp(System.currentTimeMillis())))
        throw e
    } finally {
      cached.foreach(_.unpersist())
    }
  }
}
