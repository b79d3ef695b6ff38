package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.dedup.BandIndexStore

/** Round-8 verdict #3: the executed-plan scan audit pointed at the
  * OTHER iterative/cached families beyond the g-family — s11's
  * unrolled Lloyd rounds, v1/v2's BPE merge rounds with their cached
  * vocab states, k9's rank rounds over the cached co-occurrence
  * edges, d15/d19's cached intermediate frames, and the standing
  * band-index serve. The g5 2^rounds incident proved the failure
  * mode: an iterative plan that loses (or never takes) its cache
  * re-scans its lineage once per round, and the executed plan's
  * FileSourceScan count is the ground truth for it. Bounds are the
  * measured sf0.001/sf0.01 counts (PLANS.md table); any input not
  * named in a query's bound fails the audit too.
  */
class IterativeScanAuditSpec extends SparkSpec {

  /** input basename -> max allowed executed-plan scans. All 1: each
    * family's corpus-sized prefix is built exactly once (cached or
    * exchange-reused) and every unrolled round rides it. */
  private val bounds: Map[String, Map[String, Int]] = Map(
    "s11_kmeans"            -> Map("embeddings.parquet" -> 1),
    "d19_semdedup"          -> Map("embeddings.parquet" -> 1),
    // r10: BPE's word counts and v2's doc-grain stream both read the
    // token tier (v2: one scan inside the cached vocab build + the
    // per-doc rollup's own)
    "v1_bpe_merges"         -> Map("tokens" -> 1),
    "v2_bpe_tokenize"       -> Map("tokens" -> 2),
    "k9_textrank"           -> Map("tokens" -> 1),
    // r10: d15's bands read the standing band-index tier (one cached
    // scan), plus the documents spine for its output contract
    "d15_incremental_dedup" -> Map("band_index" -> 1,
                                   "documents.parquet" -> 1),
  )

  test("iterative queries scan their lineage once, not once per round") {
    val qs = graft.queries.Registry.queries
    for ((name, bound) <- bounds.toSeq.sortBy(_._1)) {
      val counts = ScanCount.counts(spark, sfDir, qs(name))
      for ((input, n) <- counts) {
        withClue(s"$name scans $input $n times (bound ${bound.get(input)}): ") {
          assert(bound.contains(input) && n <= bound(input))
        }
      }
    }
  }

  test("band-index serve probes the tier, never re-derives corpus bands") {
    val fn: (SparkSession, String) => DataFrame = (s, d) =>
      BandIndexStore.dedupBatchAgainstCorpus(s, d,
        Tables.loadParallel(s, d, "documents").filter(col("doc_id") % 10 === 7))
    val counts = ScanCount.counts(spark, sfDir, fn)
    // band_index tier read at most once (broadcast reuse can hide it
    // from the walker entirely — the g-family audit's documented
    // blind spot); documents appears only as the BATCH side (band
    // map, cached once, exchange-reused into the output spine). A
    // corpus-band re-derivation would surface as extra documents
    // scans — the shingle pipeline can't hide in the batch's counts.
    val bound = Map("band_index" -> 1, "documents.parquet" -> 2)
    for ((input, n) <- counts) {
      withClue(s"band-index serve scans $input $n times (bound ${bound.get(input)}): ") {
        assert(bound.contains(input) && n <= bound(input))
      }
    }
  }
}
