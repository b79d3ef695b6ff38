package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Caching.RegisterSyntax

/** Document deduplication suite over the `documents` table — the
  * training-data-pipeline operators a 100 TB corpus clean needs.
  *
  * All hashing is md5-based so every query is reproducible in the
  * DuckDB oracle (both engines agree on md5 hex); minhash "values" are
  * lexicographic minima of md5 strings, which makes MinHash's
  * permutation trick engine-neutral.
  *
  * Scale notes (100 TB): every operator here is a map stage plus at
  * most one shuffle keyed on doc/band/shingle — no driver-side state.
  * The shingle self-join (d5) is the one quadratic risk: frequent
  * shingles blow up the pair space, so a production run would drop
  * shingles above a document-frequency cap before the join (the
  * standard stop-shingle prefilter); the LSH banding path (d3) is the
  * intended route at full scale.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** Normalized text → word tokens → distinct word-3-gram shingles.
    * `greatest(n-2, 1)` keeps sub-3-token docs alive with a short
    * shingle instead of Spark's descending `sequence(1, 0)` surprise.
    */
  private[graft] def withShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens", expr("split(lower(trim(text)), ' +')"))
      .withColumn("shingles",
        expr("""array_distinct(transform(sequence(1, greatest(size(tokens)-2, 1)),
                j -> concat(element_at(tokens, j), ' ',
                            coalesce(element_at(tokens, j+1), ''), ' ',
                            coalesce(element_at(tokens, j+2), ''))))"""))

  /** (keep..., sh) shingle rows with the shingle transform INLINE in
    * the generator, not projected to a column first. The inline form
    * matters: over a named `shingles` column, InferFiltersFromGenerate
    * adds `size(shingles) > 0`, CollapseProject inlines the whole
    * interpreted higher-order transform into that filter (re-deriving
    * `split` three times), and the filter then pushes below the
    * repartition onto the parquet scan's SINGLE partition — the entire
    * shingle computation runs serially, twice (measured 9.7s vs 0.4s
    * at sf0.1). A non-attribute generator input skips the inference;
    * the `tokens` projection stays separate so the split isn't
    * re-evaluated inside the lambda.
    */
  private[graft] def shingleRows(docs: DataFrame,
                                 keep: Seq[String] = Seq("doc_id", "lang")): DataFrame =
    docs
      .withColumn("tokens", expr("split(lower(trim(text)), ' +')"))
      .select(keep.map(col) :+
        explode(expr("""array_distinct(transform(sequence(1, greatest(size(tokens)-2, 1)),
                j -> concat(element_at(tokens, j), ' ',
                            coalesce(element_at(tokens, j+1), ''), ' ',
                            coalesce(element_at(tokens, j+2), ''))))""")).as("sh"): _*)

  /** DuckDB equivalents of the two derived columns above. element_at
    * past the end is NULL in both engines but Spark's concat NULLs out
    * while DuckDB's skips — the explicit coalesce makes sub-3-token
    * docs identical on both sides.
    */
  private[graft] val oracleTokens =
    "str_split_regex(lower(trim(text)), ' +')"
  private[graft] val oracleShingles =
    """list_distinct(list_transform(range(1, greatest(len(tokens)-2, 1)+1),
       j -> concat(tokens[j], ' ', coalesce(tokens[j+1], ''), ' ',
                   coalesce(tokens[j+2], ''))))"""

  // =========================================================================
  // d1 — exact dedup: hash-groupBy on normalized content
  // =========================================================================

  /** One shuffle on the 128-bit content hash; the canonical survivor is
    * min(doc_id). At 100 TB this is the cheapest dedup pass and runs
    * first to shrink the corpus for the fuzzy passes.
    */
  val d1ExactDedup: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), " +", " "))
        .as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val d1ExactDedupSql: String = """
    SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS content_hash,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1"""

  // =========================================================================
  // d2 — MinHash signatures (16 hashes = 4 bands × 4 rows)
  // =========================================================================

  private val NumHashes = 16
  private val BandSize = 4
  private val NumBands = NumHashes / BandSize

  /** Universal-hash family over one md5 per shingle: the shingle is
    * hashed once (the expensive part), reduced mod a Mersenne prime,
    * then the 16 "permutations" are cheap `(m·aᵢ + bᵢ) mod p` mixes —
    * the standard MinHash construction, ~16× less hashing than
    * md5-per-seed. All int64 ops stay under 2^47, exact in both
    * engines.
    */
  private val P = 2147483647L // 2^31 - 1
  private def hashA(i: Int): Long = (7919L * (i + 1)) % 65536L
  private def hashB(i: Int): Long = (104729L * (i + 1)) % P

  private def mhCol(i: Int): String = f"mh$i%02d"

  /** One md5-derived long per shingle — the expensive half of the
    * MinHash construction, stored in the shingle tier so queries mix
    * longs instead of re-hashing strings. */
  private[dedup] val HmExpr: String =
    s"transform(shingles, x -> cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint) % $P)"

  /** One md5-derived long per token — SimHash's input stream,
    * tier-stored for the same reason. */
  private[dedup] val HsExpr: String =
    "transform(tokens, t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))"

  /** doc_id + 16 minhash columns from an already-shingled frame.
    * Pure per-row map stage: no shuffle. A frame that already carries
    * `hm` (the shingle tier) skips the md5 pass entirely. */
  private[graft] def signaturesOf(shingled: DataFrame): DataFrame = {
    val mhs = (0 until NumHashes).map { i =>
      expr(s"array_min(transform(hm, m -> (m * ${hashA(i)} + ${hashB(i)}) % $P))")
        .as(mhCol(i))
    }
    val withHm =
      if (shingled.columns.contains("hm")) shingled
      else shingled.withColumn("hm", expr(HmExpr))
    withHm.select(col("doc_id") +: mhs: _*)
  }

  /** doc_id + 16 minhash columns, SERVED from the shingle tier's
    * stored `hm` longs: the per-query cost is 16 integer mixes per
    * shingle — the md5s were paid once at tier build. */
  def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(ShingleStore.served(s, dir).select("doc_id", "hm"))

  val d2MinhashSignature: Q = (s, dir) => signatures(s, dir)

  /** Shared oracle CTE producing the same signature table in DuckDB. */
  private val signatureCte: String = {
    val mhs = (0 until NumHashes).map { i =>
      s"list_aggregate(list_transform(hm, m -> (m * ${hashA(i)} + ${hashB(i)}) % $P), 'min') AS ${mhCol(i)}"
    }.mkString(",\n             ")
    s"""t AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    sh_t AS (SELECT doc_id, $oracleShingles AS sh FROM t),
    hm_t AS (SELECT doc_id,
               list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $P) AS hm
             FROM sh_t),
    sig AS (SELECT doc_id,
             $mhs
            FROM hm_t)"""
  }

  val d2MinhashSignatureSql: String = s"WITH $signatureCte SELECT * FROM sig"

  // =========================================================================
  // d3 — LSH banding: candidate near-dup pairs
  // =========================================================================

  /** Docs sharing any of the 4 band hashes become candidate pairs.
    * One shuffle on (band_idx, band_hash); the distinct pair set is the
    * candidate list a verifier (d5's Jaccard) would re-score. Band
    * buckets are tiny relative to the corpus, so the self-join inside a
    * bucket is bounded — the whole point of banding at scale.
    */
  /** (doc_id, band_idx, band_hash) — the LSH bucket keys. */
  private[graft] def bandsOf(sig: DataFrame): DataFrame = {
    val bandCols = (0 until NumBands).map { b =>
      md5(concat_ws("|", (0 until BandSize).map(r => col(mhCol(b * BandSize + r))): _*))
    }
    sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Band keys straight from a `documents`-shaped frame — the
    * shingle→minhash→band pipeline BandIndexStore materializes. */
  private[dedup] def bandKeysOf(docs: DataFrame): DataFrame =
    bandsOf(signaturesOf(withShingles(docs)))

  private[graft] def lshPairsOf(sig: DataFrame): DataFrame =
    // persist: both sides of the self-join read the same tiny
    // (doc, band) frame instead of recomputing the shingle+hash
    // pipeline twice (cache-manager dedupes identical plans, so
    // repeated invocations share one entry)
    lshPairsFromBands(bandsOf(sig).registerCache())

  /** d3's pair contract over an already-materialized band frame —
    * what the standing `BandIndexStore.corpusIndex` tier serves. */
  private[graft] def lshPairsFromBands(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** SERVED from the standing band index: the tiers compose —
    * shingle tier feeds the band tier's build, d3 reads the bands and
    * pays only the bounded bucket self-join (d15's probe-side shape,
    * applied to the corpus×corpus case). */
  val d3LshPairs: Q = (s, dir) =>
    lshPairsFromBands(BandIndexStore.corpusIndex(s, dir))

  val d3LshPairsSql: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(r => s"CAST(${mhCol(b * BandSize + r)} AS VARCHAR)")
      s"SELECT doc_id, $b AS band_idx, md5(${cols.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""WITH $signatureCte,
    bands AS (
      $bandSelects)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id"""
  }

  // =========================================================================
  // d4 — SimHash (32-bit) fingerprints
  // =========================================================================

  /** Majority vote per bit over the token hash stream; token repeats
    * weight the vote, as in the original SimHash. Per-row map stage.
    */
  private[graft] def simhashOf(shingled: DataFrame): DataFrame = {
    val bitSum = (0 until 32).map { b =>
      s"(case when 2*size(filter(hs, h -> shiftright(h, $b) % 2 = 1)) > size(hs) then ${1L << b} else 0 end)"
    }.mkString(" + ")
    val withHs =
      if (shingled.columns.contains("hs")) shingled
      else shingled.withColumn("hs", expr(HsExpr))
    withHs.select(col("doc_id"), expr(s"cast($bitSum as bigint)").as("simhash"))
  }

  val d4Simhash: Q = (s, dir) =>
    // tier-served: reads only the stored per-token longs (hs) — never
    // the text, never an md5
    simhashOf(ShingleStore.served(s, dir).select("doc_id", "hs"))

  val d4SimhashSql: String = {
    val bitSum = (0 until 32).map { b =>
      s"(case when 2*len(list_filter(hs, h -> (h >> $b) & 1 = 1)) > len(hs) then ${1L << b} else 0 end)"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    h AS (SELECT doc_id,
            list_transform(tokens, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
          FROM t)
    SELECT doc_id, CAST($bitSum AS BIGINT) AS simhash FROM h"""
  }

  // =========================================================================
  // d5 — n-gram Jaccard verification pairs
  // =========================================================================

  /** Exact Jaccard over distinct 3-gram shingles for pairs sharing at
    * least one shingle within a language block. The shingle self-join
    * only materializes co-occurring pairs (sparse), then per-doc
    * shingle counts are broadcast back in. jaccard is an
    * integer/integer division — bit-exact vs the oracle.
    */
  val d5NgramJaccard: Q = (s, dir) => {
    // persist: the shingled corpus feeds four plan branches (both
    // self-join sides + both count joins); one materialization —
    // read from the shingle tier (pruned to 3 columns, no re-shingle)
    val docs = ShingleStore.served(s, dir)
      .select("doc_id", "lang", "shingles").registerCache()
    val sh = docs.select(col("doc_id"), col("lang"),
      explode(col("shingles")).as("sh"))
    val counts = docs.select(col("doc_id"), size(col("shingles")).as("nsh"))
    val shared = sh.as("x")
      .join(sh.as("y"),
        col("x.lang") === col("y.lang") && col("x.sh") === col("y.sh") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared") / (col("ca.nsh") + col("cb.nsh") - col("shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val d5NgramJaccardSql: String = s"""
    WITH t AS (SELECT doc_id, lang, $oracleTokens AS tokens FROM documents),
    s AS (SELECT doc_id, lang, $oracleShingles AS sh FROM t),
    e AS (SELECT doc_id, lang, unnest(sh) AS g FROM s),
    shared AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS shared
      FROM e x JOIN e y ON x.lang = y.lang AND x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, len(sh) AS nsh FROM s)
    SELECT doc_a, doc_b,
           shared / (ca.nsh + cb.nsh - shared) AS jaccard
    FROM shared
    JOIN counts ca ON doc_a = ca.doc_id
    JOIN counts cb ON doc_b = cb.doc_id
    WHERE shared / (ca.nsh + cb.nsh - shared) >= 0.5"""

  // =========================================================================
  // d7 — stop-shingle-prefiltered Jaccard (the d5 scale path, as code)
  // =========================================================================

  /** d5 with the production prefilter applied: shingles occurring in
    * more than `DfCap` documents are dropped before the self-join, so
    * the pair fan-out per shingle is bounded by DfCap² instead of the
    * hottest shingle's frequency — the knob that keeps the join
    * tractable at 100 TB. Jaccard is then over the filtered sets
    * (denominators shrink identically on both engines, so the oracle
    * stays bit-exact).
    */
  private val DfCap = 20

  val d7JaccardPrefiltered: Q = (s, dir) => {
    val sh = ShingleStore.shingleRows(s, dir)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap)
      .select("sh")
    val shF = sh.join(rare, "sh").registerCache()
    val counts = shF.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val shared = shF.as("x")
      .join(shF.as("y"),
        col("x.lang") === col("y.lang") && col("x.sh") === col("y.sh") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared") / (col("ca.nsh") + col("cb.nsh") - col("shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val d7JaccardPrefilteredSql: String = s"""
    WITH t AS (SELECT doc_id, lang, $oracleTokens AS tokens FROM documents),
    s AS (SELECT doc_id, lang, $oracleShingles AS sh FROM t),
    e AS (SELECT doc_id, lang, unnest(sh) AS g FROM s),
    rare AS (SELECT g FROM e GROUP BY g HAVING count(*) <= $DfCap),
    ef AS (SELECT e.* FROM e JOIN rare USING (g)),
    shared AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS shared
      FROM ef x JOIN ef y ON x.lang = y.lang AND x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, count(*) AS nsh FROM ef GROUP BY doc_id)
    SELECT doc_a, doc_b,
           shared / (ca.nsh + cb.nsh - shared) AS jaccard
    FROM shared
    JOIN counts ca ON doc_a = ca.doc_id
    JOIN counts cb ON doc_b = cb.doc_id
    WHERE shared / (ca.nsh + cb.nsh - shared) >= 0.5"""

  // =========================================================================
  // d6 — SimHash hamming near-dup pairs
  // =========================================================================

  /** Pairs whose 32-bit SimHash differs in ≤ 6 bits, blocked on the
    * upper 16 bits (the standard SimHash-table trick: near-identical
    * fingerprints agree on most prefix bits, so blocking bounds the
    * quadratic join; a full production table uses several bit
    * rotations as alternate block keys). `bit_count(xor)` is a single
    * codegen'd instruction per pair.
    */
  private[graft] def simhashPairsOf(simhash: DataFrame): DataFrame = {
    val sh = simhash
      .withColumn("block", expr("shiftright(simhash, 16)"))
      .registerCache()
    sh.as("a")
      .join(sh.as("b"),
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("bit_count(a.simhash ^ b.simhash)"))
      .filter(col("hamming") <= 6)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
  }

  val d6SimhashHamming: Q = (s, dir) => simhashPairsOf(d4Simhash(s, dir))

  val d6SimhashHammingSql: String = {
    val bitSum = (0 until 32).map { b =>
      s"(case when 2*len(list_filter(hs, h -> (h >> $b) & 1 = 1)) > len(hs) then ${1L << b} else 0 end)"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    h AS (SELECT doc_id,
            list_transform(tokens, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
          FROM t),
    sh AS (SELECT doc_id, CAST($bitSum AS BIGINT) AS simhash FROM h),
    blocked AS (SELECT doc_id, simhash, simhash >> 16 AS block FROM sh)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6"""
  }

  // =========================================================================
  // d8 — duplicate clusters: connected components over LSH pairs
  // =========================================================================

  /** Pairwise candidates (d3) are not enough to dedup: if A~B and B~C,
    * keeping "one of each pair" can still keep two near-copies. The
    * canonical pass groups pairs into connected components and keeps
    * min(doc_id) per component.
    *
    * Distributed min-label propagation: every node starts as its own
    * label; each round every node takes the min label among itself and
    * its neighbors; converged when no label changes. Rounds = cluster
    * diameter — near-dup clusters are shallow (stars/cliques from
    * banding), so this is 2-4 shuffles in practice, each keyed on
    * node. `localCheckpoint` truncates the growing loop lineage so
    * round N's plan doesn't replay rounds 1..N-1. No driver-side data;
    * the driver only reads one convergence scalar per round: labels
    * are monotonically non-increasing, so Σlabel strictly decreases
    * until the fixpoint — a single aggregate, not a join-and-compare
    * against the previous round. Edges are persisted pre-partitioned
    * on `src` so every round's propagation join reuses that exchange
    * instead of re-shuffling the (larger) edge side.
    */
  def components(pairs: DataFrame, durable: Boolean = false): DataFrame = {
    // Lineage truncation seam: `localCheckpoint` keeps round state in
    // executor storage — fastest locally, but on a real cluster one
    // lost executor mid-loop discards every completed round (local
    // checkpoint blocks are unrecoverable). `durable = true` routes
    // the same truncation through a reliable `checkpoint()` to the
    // session's cluster-FS checkpoint dir, making round state survive
    // executor loss at the cost of one FS write per round — the right
    // trade at 100 TB where a components loop is hours, not seconds.
    val sc = pairs.sparkSession.sparkContext
    require(!durable || sc.getCheckpointDir.isDefined,
      "durable components needs spark.sparkContext.setCheckpointDir (cluster FS)")
    // Durable path: persist BEFORE checkpoint — a reliable checkpoint
    // of an unpersisted frame runs a SECOND job that recomputes the
    // whole round from lineage just to write the files (2× compute per
    // round, exactly on the cluster path built for long runs); cached
    // blocks make that job a read. The cache is released right after
    // the round's action materializes the checkpoint. Checkpoint FILES
    // are managed by Spark's ContextCleaner: run clusters with
    // spark.cleaner.referenceTracking.cleanCheckpoints=true (or sweep
    // the checkpoint dir post-job) so per-round label sets don't
    // accumulate on the cluster FS.
    def truncate(df: DataFrame): (DataFrame, () => Unit) =
      if (durable) {
        val p = df.persist()
        (p.checkpoint(false), () => { p.unpersist(): Unit })
      } else (df.localCheckpoint(false), () => ())
    val sym = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src"))
      .persist()
    // seed with round one's result directly: from identity labels the
    // first propagation yields min(node, min(neighbors)) — one
    // aggregate instead of a join + union + aggregate cycle.
    // checkpoints are LAZY (eager=false): the convergence-sum action
    // materializes them, so each round runs ONE job (an eager
    // checkpoint + separate sum ran two), while still truncating the
    // loop lineage.
    val (labels0, release0) = truncate(sym.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("label")))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
    var labels = labels0
    var prevSum = labelSum(labels)
    release0()
    var converged = prevSum == 0L && labels.isEmpty
    while (!converged) {
      val prop = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val (next, release) = truncate(labels.union(prop)
        .groupBy("node").agg(min("label").as("label")))
      val s = labelSum(next)
      release()
      converged = s == prevSum
      prevSum = s
      labels = next
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** d8 — cluster the d3 LSH candidate pairs; survivors are the
    * per-component min doc_id. Labels serve from the materialized
    * ClusterStore tier (the convergence loop runs once per corpus
    * snapshot; d8/d10/d22 all read the same labels). */
  val d8DupClusters: Q = (s, dir) =>
    ClusterStore.lshComponents(s, dir)
      .withColumn("is_survivor", col("doc_id") === col("component"))

  /** Oracle: transitive closure via recursive CTE, component = min
    * reachable node (tractable because dup clusters are tiny; the
    * engine side uses label propagation instead precisely because
    * closure explodes at scale). Shared CTE prefix — ends at `comp` —
    * so d8 and d10 stay one definition.
    */
  /** signature → bands → candidate pairs, as a reusable CTE suffix
    * (d8/d10 components and d11 verification all start from it). */
  private val bandsPairsCte: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(r => s"CAST(${mhCol(b * BandSize + r)} AS VARCHAR)")
      s"SELECT doc_id, $b AS band_idx, md5(${cols.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""$signatureCte,
    bands AS (
      $bandSelects),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)"""
  }

  private[graft] val componentsCte: String =
    s"""WITH RECURSIVE $bandsPairsCte,
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
    comp AS (SELECT node, least(node, min(r)) AS component
             FROM reach GROUP BY node)"""

  val d8DupClustersSql: String = s"""$componentsCte
    SELECT node AS doc_id, component, node = component AS is_survivor
    FROM comp"""

  /** d9 — SEMANTIC dup clusters: the same connected-components pass
    * over the embedding near-dup pairs (s4) instead of the lexical LSH
    * pairs — catching paraphrases that shingle/minhash families miss.
    * Survivor = per-component min vec_id, as d8.
    */
  val d9SemanticClusters: Q = (s, dir) =>
    ClusterStore.embComponents(s, dir)
      .select(col("doc_id").as("vec_id"), col("component"),
        (col("doc_id") === col("component")).as("is_survivor"))

  val d9SemanticClustersSql: String = s"""
    WITH RECURSIVE pairs AS (
      SELECT vec_a AS src, vec_b AS dst
      FROM (${graft.sim.Similarity.s4EmbeddingNeardupSql}) sp),
    sym AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
    reach(node, r) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
    comp AS (SELECT node, least(node, min(r)) AS component
             FROM reach GROUP BY node)
    SELECT node AS vec_id, component, node = component AS is_survivor
    FROM comp"""

  /** d10 — survivorship election: the end of the dedup pipeline. Every
    * document gets its dup-cluster label (singletons are their own
    * cluster) and the cluster's canonical document is elected by
    * QUALITY — longest text wins, doc_id breaks ties — instead of d8's
    * arbitrary min-id. This is the row a production clean would keep.
    *
    * Singleton split: docs outside any LSH cluster — the overwhelming
    * majority of a real corpus — are rank-1 canonical by construction,
    * so they take an anti-join and NEVER enter the rank window. Only
    * cluster members (≪ corpus; bounded by the band fan-in) shuffle on
    * `component` for the tiny per-cluster sort. The naive
    * left-join+window form shuffles the entire corpus on component —
    * at 100 TB that is shuffling the table to rank groups of size 1.
    * The join strategy is left to AQE: the label map broadcasts when
    * it fits (as here), and degrades to a doc_id-co-partitioned
    * shuffle join at dup rates where it cannot — either way the
    * window's input stays members-only.
    */
  val d10Survivorship: Q = (s, dir) => {
    // persisted: both the clustered and the singleton branch read the
    // same 2-column spine — uncached, the plan scans documents twice
    // (the honest ScanCount capture surfaced exactly that)
    val docs = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("n_chars")).registerCache()
    val comp = ClusterStore.lshComponents(s, dir).registerCache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val clustered = docs
      .join(comp, Seq("doc_id"))
      .withColumn("rank_in_cluster", row_number().over(w).cast("long"))
    val singletons = docs
      .join(comp.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"),
        col("doc_id").as("component"), lit(1L).as("rank_in_cluster"))
    clustered.unionByName(singletons)
      .withColumn("is_canonical", col("rank_in_cluster") === 1L)
  }

  val d10SurvivorshipSql: String = s"""$componentsCte,
    labeled AS (
      SELECT d.doc_id, d.n_chars, coalesce(comp.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node)
    SELECT doc_id, n_chars, component,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id) AS rank_in_cluster,
           row_number() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, doc_id) = 1 AS is_canonical
    FROM labeled"""

  /** d11 — the canonical MinHash-LSH dedup pipeline in ONE query:
    * cheap candidate generation (d3's banding) followed by exact
    * Jaccard verification of ONLY the candidates. This is the
    * production composition — the quadratic verifier (d5) runs over
    * |candidates| pairs, not |corpus|², and banding's false positives
    * (band-hash collisions with low true overlap) are killed by the
    * exact check instead of surviving into the dedup decision. A left
    * join keeps zero-overlap candidates visible (verified=false) so
    * the false-positive rate itself is observable.
    */
  val d11LshVerified: Q = (s, dir) => {
    val pairs = d3LshPairs(s, dir)
    val docs = ShingleStore.served(s, dir)
      .select("doc_id", "shingles").registerCache()
    val sh = docs.select(col("doc_id"), explode(col("shingles")).as("g"))
    val counts = docs.select(col("doc_id"), size(col("shingles")).as("nsh"))
    val shared = pairs
      .join(sh.as("sa"), pairs("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        pairs("doc_b") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    pairs
      .join(shared, Seq("doc_a", "doc_b"), "left_outer")
      .withColumn("shared", coalesce(col("shared"), lit(0L)))
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared") / (col("ca.nsh") + col("cb.nsh") - col("shared")))
          .as("jaccard"))
      .withColumn("verified", col("jaccard") >= 0.5)
  }

  val d11LshVerifiedSql: String = s"""
    WITH $bandsPairsCte,
    vtok AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    sdocs AS (SELECT doc_id, $oracleShingles AS sh FROM vtok),
    e AS (SELECT doc_id, unnest(sh) AS g FROM sdocs),
    shared AS (
      SELECT doc_a, doc_b, count(*) AS shared
      FROM pairs
      JOIN e ea ON ea.doc_id = doc_a
      JOIN e eb ON eb.doc_id = doc_b AND ea.g = eb.g
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, len(sh) AS nsh FROM sdocs)
    SELECT p.doc_a, p.doc_b,
           coalesce(shared.shared, 0) AS shared,
           coalesce(shared.shared, 0) / (ca.nsh + cb.nsh - coalesce(shared.shared, 0)) AS jaccard,
           coalesce(shared.shared, 0) / (ca.nsh + cb.nsh - coalesce(shared.shared, 0)) >= 0.5 AS verified
    FROM pairs p
    LEFT JOIN shared ON p.doc_a = shared.doc_a AND p.doc_b = shared.doc_b
    JOIN counts ca ON p.doc_a = ca.doc_id
    JOIN counts cb ON p.doc_b = cb.doc_id"""

  // =========================================================================
  // d12 — exact-substring dedup via chunk hashing
  // =========================================================================

  /** The scalable approximation of suffix-array substring dedup
    * (the pass that catches boilerplate shared VERBATIM between
    * otherwise-different documents — headers, license blocks, templated
    * intros — which document-level MinHash misses when the rest of the
    * doc differs): tokenize, cut into consecutive 20-token chunks,
    * hash each chunk, and mark chunks whose hash appears in ≥2
    * distinct documents. Per doc: chunk count, duplicated-chunk count,
    * and the duplicated fraction in exact basis points.
    *
    * Plan: one explode to chunk grain, one shuffle on chunk hash for
    * the document-frequency count, one shuffle back on doc_id for the
    * per-doc rollup. Chunk grain is |tokens|/20 rows per doc — 20×
    * smaller than token grain — and at 100 TB hot boilerplate chunks
    * are exactly the high-df keys the d7-style cap would drop before
    * any pairwise use.
    */
  val d12ChunkDedup: Q = (s, dir) => {
    val ChunkTokens = 20
    val chunks = Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
      .filter(size(col("tokens")) >= ChunkTokens)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(size(tokens)/$ChunkTokens as int) - 1),
              i -> md5(array_join(slice(tokens, i*$ChunkTokens + 1, $ChunkTokens), ' ')))"""))
          .as(Seq("chunk_idx", "chunk_hash")))
    val df = chunks.groupBy("chunk_hash")
      .agg(countDistinct(col("doc_id")).as("docs_with_chunk"))
    chunks.join(df, "chunk_hash")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("docs_with_chunk") >= 2, 1L).otherwise(0L))
          .as("n_dup_chunks"))
      .withColumn("dup_bp",
        (col("n_dup_chunks") * 10000L / col("n_chunks")).cast("long"))
  }

  val d12ChunkDedupSql: String = """
    WITH t AS (
      SELECT doc_id,
             str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS tokens
      FROM documents),
    c AS (
      -- indices generated per-row from the doc's own length: a fixed
      -- range(0, N) cap would silently truncate docs longer than N*20
      -- tokens and fail the hash gate on a bigger fixture
      SELECT doc_id,
             md5(array_to_string(tokens[(i*20 + 1):(i*20 + 20)], ' ')) AS chunk_hash
      FROM (SELECT doc_id, tokens, unnest(range(0, len(tokens) // 20)) AS i
            FROM t WHERE len(tokens) >= 20)),
    df AS (SELECT chunk_hash, count(DISTINCT doc_id) AS docs_with_chunk
           FROM c GROUP BY 1)
    SELECT doc_id, count(*) AS n_chunks,
           CAST(SUM(CASE WHEN docs_with_chunk >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN docs_with_chunk >= 2 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS dup_bp
    FROM c JOIN df USING (chunk_hash)
    GROUP BY doc_id"""

  // =========================================================================
  // d13 — prefix-filtering set-similarity join (PPJoin-style)
  // =========================================================================

  /** The OTHER classic at-scale candidate generator, orthogonal to LSH
    * banding: order each doc's distinct SHINGLES by global rarity and
    * block on the 2 rarest (the "prefix") — two docs with Jaccard ≥ t
    * must share an element of their rarity prefix (prefix length
    * ⌈(1−t)·n⌉+1 in full PPJoin; 2 is the fixture-sized stand-in), so
    * joining on prefix shingles alone finds high-overlap pairs while
    * the join key is by construction the LOWEST-df element either doc
    * owns. Where LSH banding pays 16 hashes per doc and trades recall
    * for cost knobs, prefix filtering is deterministic for its
    * threshold, and the hot-key blowup (d7's cap) cannot happen
    * because frequent shingles never enter a prefix. Prefixes must be
    * built over SHINGLES, not raw tokens: a small-vocabulary corpus
    * (this fixture, or any templated domain) makes even the rarest
    * token df=O(corpus) and the candidate join quadratic — the
    * 3-gram shingle space is large enough that rarity is real.
    * Candidates verify with exact Jaccard, d11-style.
    *
    * Plan: shingle df (one shuffle), per-doc rank window (doc-keyed),
    * prefix self-join on a low-df key, verification join on shingles
    * — every shuffle keyed, no quadratic corpus step.
    */
  private[graft] def prefixJoinOf(shingled: DataFrame): DataFrame = {
    val docs = shingled
      .select(col("doc_id"), col("shingles"))
      .registerCache()
    val sh = docs.select(col("doc_id"), explode(col("shingles")).as("g"))
      .registerCache()
    val df = sh.groupBy("g").agg(count(lit(1)).as("df"))
    // the 2 rarest shingles per doc via the bounded-buffer aggregate
    // (ObjectHashAggregate, ≤2 elements per doc per partition on the
    // wire) — the window/row_number form sorts the whole doc×shingle
    // stream to keep 2 rows per doc, a corpus-scale sort at 100 TB.
    // Ordering (df asc, g asc) matches the window orderBy exactly.
    val min2 = udaf(new graft.ops.MinKStrAggregator(2))
    val prefix = sh.join(df, "g")
      .groupBy("doc_id")
      .agg(min2(col("df"), col("g")).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val counts = docs.select(col("doc_id"), size(col("shingles")).as("nsh"))
    cand
      .join(sh.as("sa"), cand("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        cand("doc_b") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared") / (col("ca.nsh") + col("cb.nsh") - col("shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  val d13PrefixJoin: Q = (s, dir) =>
    prefixJoinOf(ShingleStore.served(s, dir).select("doc_id", "shingles"))

  val d13PrefixJoinSql: String = s"""
    WITH t AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    d AS (SELECT doc_id, $oracleShingles AS sh FROM t),
    e AS (SELECT doc_id, unnest(sh) AS g FROM d),
    df AS (SELECT g, count(*) AS df FROM e GROUP BY 1),
    prefix AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, e.g,
               row_number() OVER (PARTITION BY doc_id ORDER BY df.df, e.g) AS rn
        FROM e JOIN df USING (g))
      WHERE rn <= 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b ON a.g = b.g AND a.doc_id < b.doc_id),
    shared AS (
      SELECT doc_a, doc_b, count(*) AS shared
      FROM cand
      JOIN e sa ON sa.doc_id = doc_a
      JOIN e sb ON sb.doc_id = doc_b AND sa.g = sb.g
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, len(sh) AS nsh FROM d)
    SELECT doc_a, doc_b, shared,
           shared / (ca.nsh + cb.nsh - shared) AS jaccard
    FROM shared
    JOIN counts ca ON doc_a = ca.doc_id
    JOIN counts cb ON doc_b = cb.doc_id
    WHERE shared / (ca.nsh + cb.nsh - shared) >= 0.5"""

  // =========================================================================
  // d14 — ensemble agreement across the lexical dedup families
  // =========================================================================

  /** Which families flag each candidate pair: MinHash-LSH banding
    * (d3), SimHash hamming (d6), and prefix-filtered exact Jaccard
    * (d13) are three INDEPENDENT algorithms over the same corpus — a
    * pair flagged by two or more is high-precision dedup evidence; a
    * pair flagged by exactly one maps each family's characteristic
    * false-positive mode (band collisions, hamming near-misses,
    * shared-rare-shingle coincidences). This is the ensemble
    * decisioning a production clean thresholds on, as a query. Each
    * family's pair set is ≪ corpus (their own blocking guarantees
    * it), so the union + pair-keyed rollup costs nothing next to the
    * families themselves.
    */
  val d14FamilyAgreement: Q = (s, dir) => {
    // ONE shingle-tier read feeds all three families — the
    // tokenize/shingle/md5 map stage that used to be the dominant
    // shared prefix is now the tier build, paid once per snapshot;
    // each family's own persists then cache only their narrow
    // derivations of this frame
    val shingled = ShingleStore.served(s, dir)
      .select("doc_id", "shingles", "hm", "hs")
      .registerCache()
    // r14: serving the lsh arm from the band tier (d3's path) was
    // measured and REJECTED — the extra store serve per run costs
    // more than the 16-integer-mix signature pass it saves, because
    // the signatures derive from the ALREADY-CACHED shingle frame the
    // simhash and prefix arms need anyway (interleaved A/B: tier-arm
    // consistently slower, 2.2 → 3.7 s worst sample)
    val lsh = lshPairsOf(signaturesOf(shingled))
      .select(col("doc_a"), col("doc_b"), lit("lsh").as("family"))
    val sim = simhashPairsOf(simhashOf(shingled))
      .select(col("doc_a"), col("doc_b"), lit("simhash").as("family"))
    val pfx = prefixJoinOf(shingled)
      .select(col("doc_a"), col("doc_b"), lit("prefix").as("family"))
    lsh.unionByName(sim).unionByName(pfx)
      .groupBy("doc_a", "doc_b")
      .agg(array_join(sort_array(collect_set(col("family"))), ",")
        .as("families"),
        countDistinct(col("family")).as("n_families"))
  }

  val d14FamilyAgreementSql: String = s"""
    SELECT doc_a, doc_b,
           array_to_string(list_sort(list(DISTINCT family)), ',') AS families,
           CAST(count(DISTINCT family) AS BIGINT) AS n_families
    FROM (
      SELECT doc_a, doc_b, 'lsh' AS family FROM ($d3LshPairsSql)
      UNION ALL
      SELECT doc_a, doc_b, 'simhash' AS family FROM ($d6SimhashHammingSql)
      UNION ALL
      SELECT doc_a, doc_b, 'prefix' AS family FROM ($d13PrefixJoinSql))
    GROUP BY doc_a, doc_b"""

  // =========================================================================
  // d15 — incremental dedup: new batch vs the standing corpus
  // =========================================================================

  /** The shape a production ingest actually runs daily: dedup ONLY the
    * arriving batch against the standing corpus, never re-pairing the
    * corpus with itself. The new slice's band keys equi-join the
    * corpus's band index — work per batch is O(|batch| + matched
    * buckets), independent of corpus size once the corpus bands are a
    * standing table partitioned on `band_hash` (here both sides derive
    * from one in-query band frame; the seam is the same join). Every
    * new doc is reported, matched or not, with its corpus-candidate
    * count — the downstream gate (verify-then-drop, d11-style) needs
    * the misses too.
    *
    * The batch is the deterministic `doc_id % 10 = 7` slice so the
    * DuckDB oracle can reproduce the split exactly.
    */
  val d15IncrementalDedup: Q = (s, dir) => {
    // persisted: the new-side and corpus-side filters both read it —
    // and the bands ARE the standing tier now, not a recompute
    val bands = BandIndexStore.corpusIndex(s, dir).registerCache()
    val hits = bands.filter(col("doc_id") % 10 === 7).as("n")
      .join(bands.filter(col("doc_id") % 10 =!= 7).as("c"),
        col("n.band_idx") === col("c.band_idx") &&
        col("n.band_hash") === col("c.band_hash"))
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(countDistinct(col("c.doc_id")).as("n_corpus_matches"))
    Tables.loadParallel(s, dir, "documents")
      .filter(col("doc_id") % 10 === 7)
      .select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_matches"), lit(0L)).as("n_corpus_matches"),
        (coalesce(col("n_corpus_matches"), lit(0L)) > 0).as("is_dup"))
  }

  val d15IncrementalDedupSql: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(r => s"CAST(${mhCol(b * BandSize + r)} AS VARCHAR)")
      s"SELECT doc_id, $b AS band_idx, md5(${cols.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""WITH $signatureCte,
    bands AS (
      $bandSelects),
    hits AS (
      SELECT n.doc_id AS doc_id,
             CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_corpus_matches
      FROM bands n JOIN bands c
        ON n.band_idx = c.band_idx AND n.band_hash = c.band_hash
      WHERE n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
      GROUP BY 1)
    SELECT d.doc_id,
           coalesce(h.n_corpus_matches, CAST(0 AS BIGINT)) AS n_corpus_matches,
           coalesce(h.n_corpus_matches, CAST(0 AS BIGINT)) > 0 AS is_dup
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
    LEFT JOIN hits h USING (doc_id)"""
  }

  // =========================================================================
  // d16 — containment (asymmetric near-dup: excerpt inside longer doc)
  // =========================================================================

  private val ContainmentThreshold = 0.8

  /** Containment `|A∩B| / |A|` over the df-capped shingle sets —
    * the asymmetric question Jaccard can't answer: a quote or excerpt
    * A buried in a much longer B has tiny Jaccard (the union is
    * B-sized) but containment ≈ 1. Training corpora dedup on exactly
    * this (boilerplate headers, quoted articles, license blocks).
    *
    * Candidates come from d7's machinery unchanged: the DfCap
    * prefilter bounds fan-out per shingle, pairs form once in
    * canonical doc_a < doc_b order, and ONE shared-count aggregate
    * serves BOTH directions — each unordered pair explodes into its
    * two ordered (contained, container) readings and the threshold
    * keeps whichever holds (both, for same-length near-dups).
    * Division is long/long → IEEE double — correctly rounded in both
    * engines, d7's precedent.
    */
  val d16Containment: Q = (s, dir) => {
    val sh = ShingleStore.shingleRows(s, dir)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap)
      .select("sh")
    val shF = sh.join(rare, "sh").registerCache()
    val counts = shF.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val shared = shF.as("x")
      .join(shF.as("y"),
        col("x.lang") === col("y.lang") && col("x.sh") === col("y.sh") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(explode(array(
        struct(col("doc_a").as("contained_id"), col("doc_b").as("container_id"),
          (col("shared") / col("ca.nsh")).as("containment")),
        struct(col("doc_b").as("contained_id"), col("doc_a").as("container_id"),
          (col("shared") / col("cb.nsh")).as("containment")))).as("r"))
      .select("r.*")
      .filter(col("containment") >= ContainmentThreshold)
  }

  val d16ContainmentSql: String = s"""
    WITH t AS (SELECT doc_id, lang, $oracleTokens AS tokens FROM documents),
    s AS (SELECT doc_id, lang, $oracleShingles AS sh FROM t),
    e AS (SELECT doc_id, lang, unnest(sh) AS g FROM s),
    rare AS (SELECT g FROM e GROUP BY g HAVING count(*) <= $DfCap),
    ef AS (SELECT e.* FROM e JOIN rare USING (g)),
    shared AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS shared
      FROM ef x JOIN ef y ON x.lang = y.lang AND x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, count(*) AS nsh FROM ef GROUP BY doc_id),
    both_dirs AS (
      SELECT doc_a AS contained_id, doc_b AS container_id,
             shared / ca.nsh AS containment
      FROM shared JOIN counts ca ON doc_a = ca.doc_id
      UNION ALL
      SELECT doc_b, doc_a, shared / cb.nsh
      FROM shared JOIN counts cb ON doc_b = cb.doc_id)
    SELECT contained_id, container_id, containment
    FROM both_dirs WHERE containment >= $ContainmentThreshold"""

  // =========================================================================
  // d17 — exact-substring span dedup via winnowing fingerprints
  // =========================================================================

  private val SpanK = 10   // tokens per exact span (k-gram)
  private val SpanW = 4    // winnowing window (k-gram hashes per window)
  private val SpanDfCap = 64 // fingerprint document-frequency cap

  /** Exact contiguous-span dedup — the suffix-array question ("do these
    * docs share a verbatim run of ≥ k tokens?") answered with MOSS-style
    * winnowing instead of a suffix array, because winnowing is a pure
    * map + bounded window per document and distributes for free.
    *
    * Per doc: hash every k-token gram (md5 of the joined span, so a
    * fingerprint match IS a verbatim span match), then keep only each
    * trailing-window minimum — ~2/(W+1) of the k-gram hashes survive,
    * yet any shared run of ≥ W+K-1 tokens is guaranteed to surface a
    * common fingerprint (the winnowing guarantee). Candidate pairs form
    * by equi-join on fingerprint; a document-frequency cap bounds the
    * fan-out per fingerprint exactly like d7's stop-shingle prefilter —
    * that cap is the 100 TB knob (boilerplate spans hit millions of
    * docs; they are dedup-useless and get dropped before the join).
    *
    * Scale shape: one narrow map + per-doc bounded window (partition =
    * one document's grams, never global), one shuffle on fingerprint
    * shared by the df-count and the pair join. No driver state.
    */
  val d17SpanDedup: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val grams = ShingleStore.served(s, dir)
      .select("doc_id", "tokens")
      .filter(size(col("tokens")) >= SpanK)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(1, size(tokens)-$SpanK+1),
              j -> cast(conv(substr(md5(array_join(slice(tokens, j, $SpanK), ' ')), 1, 15), 16, 10) as bigint) % $P)"""))
          .as(Seq("j", "h")))
    val fp = grams
      .withColumn("fp", min("h").over(
        Window.partitionBy("doc_id").orderBy("j").rowsBetween(0, SpanW - 1)))
      .select("doc_id", "fp").distinct()
      .registerCache()
    val rare = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= SpanDfCap)
      .select("fp")
    val kept = fp.join(rare, "fp")
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  val d17SpanDedupSql: String = s"""
    WITH t AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    kg AS (
      SELECT doc_id, len(tokens) - $SpanK + 1 AS m,
             list_transform(range(1, greatest(len(tokens)-$SpanK+1, 0)+1),
               j -> ('0x' || substr(md5(array_to_string(tokens[j:j+$SpanK-1], ' ')), 1, 15))::BIGINT % $P) AS hs
      FROM t WHERE len(tokens) >= $SpanK),
    pos AS (SELECT doc_id, hs[j] AS h, j FROM kg, unnest(range(1, m+1)) AS r(j)),
    fp AS (
      SELECT DISTINCT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY j
                          ROWS BETWEEN CURRENT ROW AND ${SpanW - 1} FOLLOWING) AS fp
      FROM pos),
    rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $SpanDfCap),
    kept AS (SELECT f.* FROM fp f JOIN rare USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2"""

  // =========================================================================
  // d18 — MinHash estimate accuracy vs exact Jaccard (sketch audit)
  // =========================================================================

  /** "Measure the sketch, don't trust it": for every d3 LSH candidate
    * pair, the 16-component MinHash Jaccard estimate side by side with
    * the EXACT shingle Jaccard, both in integer basis points, plus the
    * signed error — s8's recall-measurement discipline applied to the
    * dedup sketch family. This is the query that tells a 100 TB dedup
    * run whether its banding threshold is calibrated (mean |err| and
    * the est≥threshold>exact false-accept count feed the knob).
    *
    * Scale shape: candidates come from d3's bounded banding join; the
    * per-pair work is two broadcast-free equi-joins onto the signature
    * and shingle-set frames (pair grain ≪ corpus grain by LSH
    * construction) and pure array arithmetic — no new quadratic
    * surface.
    */
  val d18MinhashAccuracy: Q = (s, dir) => {
    val sig = signatures(s, dir)
    val sigArr = sig.select(col("doc_id"),
      array((0 until NumHashes).map(i => col(mhCol(i))): _*).as("sig"))
      .registerCache()
    val sh = ShingleStore.served(s, dir)
      .select("doc_id", "shingles").registerCache()
    lshPairsOf(sig)
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr(s"10000 * size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m)) div $NumHashes")
          .as("est_bp"),
        expr("10000 * size(array_intersect(sh_a, sh_b)) div size(array_union(sh_a, sh_b))")
          .as("exact_bp"))
      .withColumn("err_bp", col("est_bp") - col("exact_bp"))
  }

  val d18MinhashAccuracySql: String = {
    val bandSelects = (0 until NumBands).map { b =>
      val cols = (0 until BandSize).map(r => s"CAST(${mhCol(b * BandSize + r)} AS VARCHAR)")
      s"SELECT doc_id, $b AS band_idx, md5(${cols.mkString(" || '|' || ")}) AS band_hash FROM sig"
    }.mkString("\n      UNION ALL ")
    s"""WITH $signatureCte,
    bands AS (
      $bandSelects),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id),
    sigl AS (SELECT doc_id, [mh00, mh01, mh02, mh03, mh04, mh05, mh06, mh07, mh08, mh09, mh10, mh11, mh12, mh13, mh14, mh15] AS sig FROM sig),
    est AS (
      SELECT doc_a, doc_b,
             10000 * len(list_filter(range(1, ${NumHashes} + 1),
               i -> sa.sig[i] = sb.sig[i])) // $NumHashes AS est_bp,
             10000 * len(list_intersect(ga.sh, gb.sh))
               // len(list_distinct(ga.sh || gb.sh)) AS exact_bp
      FROM cand
      JOIN sigl sa ON doc_a = sa.doc_id
      JOIN sigl sb ON doc_b = sb.doc_id
      JOIN sh_t ga ON doc_a = ga.doc_id
      JOIN sh_t gb ON doc_b = gb.doc_id)
    SELECT doc_a, doc_b, CAST(est_bp AS BIGINT) AS est_bp,
           CAST(exact_bp AS BIGINT) AS exact_bp,
           CAST(est_bp - exact_bp AS BIGINT) AS err_bp
    FROM est"""
  }

  // =========================================================================
  // d20 — Bloom-pruned decontamination
  // =========================================================================

  /** c3's decontamination semantics with the 100 TB join order made
    * explicit: before any train-side gram reaches an exchange, it is
    * probed against an ~8 KB Bloom filter built from the EVAL side's
    * distinct shingles — the runtime-filter pattern (Spark's own
    * InjectRuntimeFilter does this for selective joins) spelled out as
    * first-class dataflow so the prune is guaranteed, tunable, and
    * visible in the plan.
    *
    * Construction is pure built-ins, no driver state: eval shingles
    * explode into [[BloomK]] probe positions (`xxhash64(sh, i)` —
    * engine-internal, so the oracle never needs to reproduce it), the
    * positions aggregate to a ≤[[BloomBits]]/64-row (word-index →
    * bit-OR mask) frame, and the train side checks its own K positions
    * through K chained BROADCAST left joins — all map-side, zero
    * shuffles, one codegen span. Only bloom-positive grams (true
    * contaminations + ~0.1% false positives at K=3, m/n≈30) enter the
    * exact semi-join that confirms contamination; the anti-join back to
    * the doc grain emits the clean train split.
    *
    * No false negatives by construction, so the Bloom stage is
    * invisible to the oracle: the result equals the plain exact
    * anti-join SQL. At 100 TB the train gram exchange — the dominant
    * cost of c3's shape — shrinks by the contamination rate (~1000×
    * for a clean corpus); the filter itself ships once per executor.
    */
  private val BloomBits = 1 << 16
  private val BloomK = 3

  val d20BloomDecontaminate: Q = (s, dir) => {
    // tier-served; the split bucket is a doc_id-derived map column,
    // re-stamped on the pruned (doc_id, shingles) read
    val grams = ShingleStore.served(s, dir)
      .withColumn("bucket", graft.corpus.Corpus.splitBucket)
      .select(col("doc_id"), col("bucket"), explode(col("shingles")).as("sh"))
      .registerCache()
    val evalSh = grams.filter(col("bucket") >= 950).select("sh").distinct()
      .registerCache()
    val bloom = evalSh
      .select(explode(expr(
        s"transform(sequence(0, ${BloomK - 1}, 1), i -> pmod(xxhash64(sh, i), ${BloomBits}L))"))
        .as("pos"))
      .select(expr("cast(pos div 64 as int)").as("widx"),
              expr("cast(pos % 64 as int)").as("bit"))
      .groupBy("widx")
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), bit))").as("bits"))
    val probed = (0 until BloomK).foldLeft(
        grams.filter(col("bucket") < 900).select("doc_id", "sh")) { (t, i) =>
      val b = bloom.select(col("widx").as(s"widx$i"), col("bits").as(s"bits$i"))
      t.withColumn(s"pos$i", expr(s"pmod(xxhash64(sh, $i), ${BloomBits}L)"))
        .join(broadcast(b),
          expr(s"cast(pos$i div 64 as int) = widx$i"), "left")
        .withColumn(s"hit$i", coalesce(
          expr(s"(shiftright(bits$i, cast(pos$i % 64 as int)) & 1) = 1"),
          lit(false)))
    }
    val contaminated = probed
      .filter((0 until BloomK).map(i => col(s"hit$i")).reduce(_ && _))
      .select("doc_id", "sh")
      .join(evalSh, Seq("sh"), "left_semi")
      .select("doc_id").distinct()
    ShingleStore.served(s, dir).select("doc_id")
      .withColumn("bucket", graft.corpus.Corpus.splitBucket)
      .filter(col("bucket") < 900).select("doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  val d20BloomDecontaminateSql: String = {
    val oracleBucket = graft.corpus.Corpus.oracleBucket
    s"""WITH tok AS (SELECT doc_id, $oracleBucket AS bucket,
                            $oracleTokens AS tokens
                     FROM documents),
    t AS (SELECT doc_id, bucket, $oracleShingles AS sh FROM tok),
    e AS (SELECT doc_id, bucket, unnest(sh) AS g FROM t),
    eval_g AS (SELECT DISTINCT g FROM e WHERE bucket >= 950),
    contaminated AS (
      SELECT DISTINCT e.doc_id FROM e JOIN eval_g USING (g)
      WHERE e.bucket < 900)
    SELECT doc_id FROM t
    WHERE bucket < 900
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)"""
  }

  /** d21 — cross-source duplication matrix: how many near-dup pairs
    * straddle each (source, source) combination. The corpus-governance
    * readout dedup feeds a data-sourcing decision with — "CC-derived
    * set B is 40% contained in set A, deprioritize it" — and the
    * source-grain rollup of d3's pair list (diagonal = within-source
    * redundancy, off-diagonal = cross-source contamination).
    *
    * Scale shape: d3's banded candidates (never all-pairs), then two
    * keyed joins attach each side's source label (doc-grain equi-joins
    * — the label map is NOT broadcast; it is corpus-sized), and the
    * rollup collapses to the |sources|² grain map-side. The unordered
    * pair key (least, greatest) makes the matrix symmetric-upper.
    */
  val d21SourceOverlap: Q = (s, dir) => {
    val src = Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    lshPairsFromBands(BandIndexStore.corpusIndex(s, dir))
      .join(src.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "src_a"), "doc_a")
      .join(src.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "src_b"), "doc_b")
      .groupBy(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  val d21SourceOverlapSql: String =
    s"""SELECT least(a.source, b.source) AS source_a,
           greatest(a.source, b.source) AS source_b,
           count(*) AS n_dup_pairs
    FROM ($d3LshPairsSql) pairs
    JOIN documents a ON pairs.doc_a = a.doc_id
    JOIN documents b ON pairs.doc_b = b.doc_id
    GROUP BY 1, 2"""

  /** d22 — clustering agreement audit: the Rand index between the
    * LEXICAL dup clustering (d8, LSH pairs) and the SEMANTIC one (d9,
    * embedding pairs) over the same document universe. d14 audits the
    * families pair-by-pair; this is the cluster-level readout — "do
    * the two dedup views partition the corpus the same way?" — the
    * number that decides whether semantic dedup is adding signal or
    * just re-finding the lexical clusters.
    *
    * Rand = (C(n,2) + 2·ΣC(n_ij,2) − ΣC(a_i,2) − ΣC(b_j,2)) / C(n,2),
    * computed from the (cluster_A × cluster_B) contingency table —
    * never from doc pairs, so the cost is the two components passes
    * plus ONE label join; the contingency grain is bounded by cluster
    * counts. Singletons label as themselves (both engines identically)
    * and every term is an exact int64 count, rand in basis points via
    * one integer division.
    */
  val d22ClusterAgreement: Q = (s, dir) => {
    val docs = Tables.loadParallel(s, dir, "documents").select("doc_id")
    val lex = ClusterStore.lshComponents(s, dir)
      .select(col("doc_id"), col("component").as("ca"))
    val sem = ClusterStore.embComponents(s, dir)
      .select(col("doc_id"), col("component").as("cb"))
    val lab = docs
      .join(lex, Seq("doc_id"), "left_outer")
      .join(sem, Seq("doc_id"), "left_outer")
      .select(
        coalesce(col("ca"), col("doc_id")).as("ca"),
        coalesce(col("cb"), col("doc_id")).as("cb"))
    val cont = lab.groupBy("ca", "cb").agg(count(lit(1)).as("nij"))
      .registerCache()
    val both = cont.agg(
      sum(expr("nij * (nij - 1) div 2")).as("pairs_both"),
      sum("nij").as("n_docs"))
    val aSide = cont.groupBy("ca").agg(sum("nij").as("ai"))
      .agg(sum(expr("ai * (ai - 1) div 2")).as("pairs_lex"))
    val bSide = cont.groupBy("cb").agg(sum("nij").as("bj"))
      .agg(sum(expr("bj * (bj - 1) div 2")).as("pairs_sem"))
    both.crossJoin(broadcast(aSide)).crossJoin(broadcast(bSide))
      .select(col("n_docs"), col("pairs_both"), col("pairs_lex"),
        col("pairs_sem"),
        expr("""((n_docs * (n_docs - 1) div 2) + 2 * pairs_both
                 - pairs_lex - pairs_sem) * 10000
                div (n_docs * (n_docs - 1) div 2)""").as("rand_bp"))
  }

  val d22ClusterAgreementSql: String = s"""
    WITH lex AS (
      SELECT doc_id, component AS ca FROM ($d8DupClustersSql) l),
    sem AS (
      SELECT vec_id AS doc_id, component AS cb FROM ($d9SemanticClustersSql) m),
    lab AS (
      SELECT coalesce(lex.ca, d.doc_id) AS ca,
             coalesce(sem.cb, d.doc_id) AS cb
      FROM documents d
      LEFT JOIN lex ON d.doc_id = lex.doc_id
      LEFT JOIN sem ON d.doc_id = sem.doc_id),
    cont AS (SELECT ca, cb, count(*) AS nij FROM lab GROUP BY 1, 2),
    s1 AS (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS pairs_both,
                  CAST(SUM(nij) AS BIGINT) AS n_docs
           FROM cont),
    s2 AS (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) AS pairs_lex
           FROM (SELECT CAST(SUM(nij) AS BIGINT) AS ai FROM cont GROUP BY ca)),
    s3 AS (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) AS pairs_sem
           FROM (SELECT CAST(SUM(nij) AS BIGINT) AS bj FROM cont GROUP BY cb))
    SELECT n_docs, pairs_both, pairs_lex, pairs_sem,
           ((n_docs * (n_docs - 1) // 2) + 2 * pairs_both
             - pairs_lex - pairs_sem) * 10000
             // (n_docs * (n_docs - 1) // 2) AS rand_bp
    FROM s1 CROSS JOIN s2 CROSS JOIN s3"""

  // =========================================================================
  // d23 — edit-distance fuzzy matching via deletion-neighborhood blocking
  // =========================================================================

  /** Entity-resolution fuzzy match: all record pairs whose names are
    * within edit distance 1, found WITHOUT an all-pairs comparison via
    * deletion-neighborhood blocking (the SymSpell/FastSS signature
    * scheme). Each string emits itself plus every single-character
    * deletion as signatures; two strings at Levenshtein ≤ 1 provably
    * share at least one signature (a substitution pair shares the
    * variant that deletes the differing position; an insertion pair
    * shares the shorter string itself), so an equi-join on signature is
    * a COMPLETE candidate generator — `levenshtein` then runs only on
    * candidates, never on the n² grid the oracle brute-forces.
    *
    * Covers the reference's fuzzy key-reconciliation need (SURVEY §2
    * F-family string normalization feeding J1 joins) as a first-class
    * scalable operator; the token-set analogue is q36/d5.
    *
    * Scale shape: signatures are linear in total characters (len+1 per
    * row, deduplicated per row by `array_distinct` — runs of equal
    * chars collapse); the join key is the signature, so fan-out per
    * bucket is bounded by how many strings restore to the same variant
    * (alphabet × positions, not corpus size). At 100 TB the knob is a
    * signature df-cap exactly like d7's stop-shingle prefilter —
    * boilerplate names that hit millions of rows are match-useless and
    * would be dropped before the join; at test SFs no bucket comes near
    * the cap so the result stays oracle-exact. One exchange on
    * signature, one distinct on the candidate pair, a codegen'd
    * `levenshtein` verify.
    */
  val d23FuzzyNameMatch: Q = (s, dir) => {
    val c = Tables.loadParallel(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    // join on the 8-byte hash of the signature, not the string: the
    // exchange ships a long instead of an ~18-char key, and a hash
    // collision can only ADD candidates, which the levenshtein verify
    // then rejects — correctness is unaffected.
    val sigs = c.select(col("id"), col("name"),
      explode(expr(
        """array_distinct(concat(
             array(xxhash64(name)),
             transform(sequence(1, length(name)),
               i -> xxhash64(concat(substr(name, 1, i-1),
                                    substr(name, i+1, length(name)))))))""")).as("sig"))
    // verify BEFORE the pair-dedup: levenshtein on a candidate
    // occurrence is cheaper than shuffling the wide (id, name)² row
    // through distinct, and the surviving pairs dedup on two longs.
    sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  val d23FuzzyNameMatchSql: String = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1"""

  // =========================================================================
  // d24 — within-document repeat trimming (a cleaning TRANSFORM)
  // =========================================================================

  // Tokens per trim chunk. The production grain is d12's 20 (or a
  // line/paragraph split on corpora that have them); 3 here because the
  // synthetic corpus is short random-word docs where longer aligned
  // chunks simply never repeat within one doc — at 3 the corpus
  // contains real within-doc repeats, so the drop path is exercised,
  // not just the rebuild.
  private val TrimChunk = 3

  /** Self-repetition removal INSIDE a document: re-emit each doc with
    * repeated chunks dropped, keeping the FIRST occurrence of
    * each distinct chunk in original order. d12 measures cross-doc
    * verbatim duplication and t6 measures the repetition ratio; this is
    * the operator that actually FIXES the pathology those flag —
    * scraped pages that loop navigation blocks, generation artifacts
    * that repeat a paragraph, templated boilerplate inside one doc.
    * The output is a transformed corpus (cleaned text + kept/total
    * accounting), not a report — the clean-pipeline stage between
    * quality gating and packing.
    *
    * Scale shape: everything is doc-keyed — the chunk explode, the
    * (doc, chunk) first-occurrence aggregate, and the ordered
    * reassembly all ride hash(doc_id)-family partitions (k8's RAKE
    * pattern); no corpus-global state, no pairs. Reassembly is a
    * sort_array over ≤(doc_len/20) position-tagged chunks per doc —
    * per-doc bounded, the ListAgg/k8 precedent.
    */
  val d24RepeatTrim: Q = (s, dir) => {
    val chunks = Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(ceil(size(tokens) / $TrimChunk.0) as int) - 1),
              i -> array_join(slice(tokens, i * $TrimChunk + 1, $TrimChunk), ' '))"""))
          .as(Seq("pos", "chunk")))
    val first = chunks.groupBy("doc_id", "chunk")
      .agg(min("pos").as("pos"), count(lit(1)).as("n_occ"))
    first.groupBy("doc_id")
      .agg(
        array_join(expr("transform(sort_array(collect_list(struct(pos, chunk))), x -> x.chunk)"), " ")
          .as("clean_text"),
        count(lit(1)).as("chunks_kept"),
        sum("n_occ").as("chunks_total"))
  }

  val d24RepeatTrimSql: String = s"""
    WITH t AS (
      SELECT doc_id,
             str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS tokens
      FROM documents),
    ch AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(tokens[(i - 1) * $TrimChunk + 1 : i * $TrimChunk], ' ') AS chunk
      FROM t, unnest(range(1, CAST(ceil(len(tokens) / $TrimChunk.0) AS BIGINT) + 1)) AS u(i)),
    fst AS (
      SELECT doc_id, chunk, min(pos) AS pos, count(*) AS n_occ
      FROM ch GROUP BY doc_id, chunk)
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
           count(*) AS chunks_kept,
           CAST(sum(n_occ) AS BIGINT) AS chunks_total
    FROM fst GROUP BY doc_id"""

  // =========================================================================
  // d25 — cross-document boilerplate stripping
  // =========================================================================

  /** Boilerplate removal ACROSS documents — the C4-style rule: a chunk
    * that appears in ≥ 1/64th of the corpus's documents is template
    * furniture (headers, navigation, license blocks), not content, and
    * is stripped from EVERY document before training. The threshold is
    * a corpus FRACTION, not an absolute count, so the rule is
    * scale-stable: growing the corpus 10× doesn't silently reclassify
    * chunks. Complements d24 (within-doc repeats) and d12 (cross-doc
    * duplication REPORT) — this is the transform that removes what d12
    * measures.
    *
    * Scale shape: chunk df is one (doc, chunk)-distinct + chunk-grain
    * count; the strip is a LEFT ANTI join of the doc-keyed chunk
    * stream against the (tiny, df-filtered) boilerplate set — at
    * production scale that set broadcasts. Rebuild is d24's per-doc
    * bounded ordered reassembly. The doc-count threshold is a one-row
    * broadcast scalar (PlanAudit-allowlisted shape).
    */
  val d25BoilerplateStrip: Q = (s, dir) => {
    val chunks = Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(ceil(size(tokens) / $TrimChunk.0) as int) - 1),
              i -> array_join(slice(tokens, i * $TrimChunk + 1, $TrimChunk), ' '))"""))
          .as(Seq("pos", "chunk")))
      .registerCache()
    val nDocs = chunks.agg(countDistinct("doc_id").as("n_docs"))
    val boiler = chunks.select("doc_id", "chunk").distinct()
      .groupBy("chunk").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= expr("greatest(2, n_docs div 64)"))
      .select("chunk")
    val totals = chunks.groupBy("doc_id").agg(count(lit(1)).as("chunks_total"))
    // totals drives the join: a doc whose chunks are ALL boilerplate
    // must survive the transform as an emptied doc (clean_text='',
    // chunks_kept=0), not silently vanish from the cleaned corpus.
    val kept = chunks.join(boiler, Seq("chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(expr("transform(sort_array(collect_list(struct(pos, chunk))), x -> x.chunk)"), " ")
          .as("clean_text"),
        count(lit(1)).as("chunks_kept"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("chunks_kept"), lit(0L)).as("chunks_kept"),
        col("chunks_total"))
  }

  val d25BoilerplateStripSql: String = s"""
    WITH t AS (
      SELECT doc_id,
             str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS tokens
      FROM documents),
    ch AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(tokens[(i - 1) * $TrimChunk + 1 : i * $TrimChunk], ' ') AS chunk
      FROM t, unnest(range(1, CAST(ceil(len(tokens) / $TrimChunk.0) AS BIGINT) + 1)) AS u(i)),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ch),
    boiler AS (
      SELECT chunk FROM (
        SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY chunk) b, nd
      WHERE df >= greatest(2, n_docs // 64)),
    totals AS (SELECT doc_id, count(*) AS chunks_total FROM ch GROUP BY doc_id),
    kept AS (
      SELECT doc_id,
             string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
             count(*) AS chunks_kept
      FROM ch ANTI JOIN boiler USING (chunk)
      GROUP BY doc_id)
    SELECT doc_id,
           coalesce(clean_text, '') AS clean_text,
           coalesce(chunks_kept, 0) AS chunks_kept,
           chunks_total
    FROM totals LEFT JOIN kept USING (doc_id)"""

  // =========================================================================
  // d26 — sorted-neighborhood fuzzy blocking (the SNM counterpart of d23)
  // =========================================================================

  private val SnmWindow = 10L

  /** Sorted-neighborhood entity resolution: sort records by name,
    * compare each record only against the next [[SnmWindow]] in sort
    * order, verify with `levenshtein`. The OTHER classical ER blocking
    * family next to d23's deletion signatures — where d23 is COMPLETE
    * for lev≤1 with data-dependent bucket fan-out, SNM has rigidly
    * bounded candidate count (W per record, any data) but bounded
    * RECALL: a pair more than W apart in sort order is missed by
    * design. Both engines implement the identical contract (pairs
    * within W sort positions AND lev ≤ 1), so the gate is exact; the
    * d23-vs-d26 result diff IS the textbook completeness-vs-cost
    * trade-off, measurable per corpus.
    *
    * Scale shape: the global sort order comes from ops/DistributedRank
    * (range exchange + per-partition offsets — no single-task sort),
    * and the neighborhood join is an EQUI-join on `rank div W` with
    * each left row emitted into its own and the next block — a pair
    * within W spans at most adjacent blocks, so every candidate is
    * found exactly once and fan-out is ≤ 2W per record by arithmetic,
    * not by data.
    */
  val d26SortedNeighborhood: Q = (s, dir) => {
    val c = Tables.loadParallel(s, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val ranked = graft.ops.DistributedRank
      .withGlobalRank(c, Seq(col("name"), col("id")), "rk", "tot")
      .drop("tot")
    val left = ranked.select(
      col("id").as("id_a"), col("name").as("name_a"), col("rk").as("rk_a"),
      explode(expr(s"array(rk div $SnmWindow, rk div $SnmWindow + 1)")).as("bkt"))
    val right = ranked.select(
      col("id").as("id_b"), col("name").as("name_b"), col("rk").as("rk_b"),
      expr(s"rk div $SnmWindow").as("bkt"))
    left.join(right,
        Seq("bkt")).filter(col("rk_b") > col("rk_a") &&
        col("rk_b") - col("rk_a") <= SnmWindow)
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select("id_a", "id_b")
  }

  val d26SortedNeighborhoodSql: String = s"""
    WITH r AS (
      SELECT c_custkey AS id, c_name AS name,
             row_number() OVER (ORDER BY c_name, c_custkey) AS rk
      FROM customer)
    SELECT a.id AS id_a, b.id AS id_b
    FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= $SnmWindow
    WHERE levenshtein(a.name, b.name) <= 1"""

  // =========================================================================
  // d27 — LSH band-count tuning sweep
  // =========================================================================

  /** Banding-parameter sweep: the SAME 16 minhashes re-banded three
    * ways — 2 bands × 8 rows (strict), 4 × 4 (d3's production
    * setting), 8 × 2 (loose) — each setting's candidate count and its
    * precision against exact Jaccard ≥ 0.5, in basis points. The
    * S-curve trade-off (more bands ⇒ more candidates, lower
    * precision) is THE knob a dedup pipeline tunes per corpus; this
    * query is the measurement that justifies d3's 4×4 the way s8/d18
    * audit the ANN/MinHash approximations.
    *
    * Scale shape: one signature materialization shared by all three
    * settings (the 16 minhashes are computed ONCE — re-banding is
    * free md5s over existing columns); each setting's bucket
    * self-join is d3's bounded-bucket shape; the exact-Jaccard
    * verify (d11's machinery) runs once over the DISTINCT union of
    * candidates, so the strict settings' pairs — subsets in practice
    * — are never re-verified per setting. Final grain: three rows. A
    * setting with zero candidates still reports (spine left join,
    * precision NULL via nullif).
    */
  val d27LshTuning: Q = (s, dir) => {
    val sig = signatures(s, dir).registerCache()
    // r15 optimization (guide §2.4 "remove shuffles outright"): the
    // three tuning arms used to run three SEPARATE bounded-bucket
    // self-joins over the same signature frame — 3 × (2 band-frame
    // exchanges + join + distinct), 30 AQE stage-jobs at sf0.1.
    // Folding the config INTO the bucket key — one exploded
    // (n_bands, band_idx, band_hash, doc_id) frame — makes it ONE
    // self-join on (n_bands, band_idx, band_hash): configs can never
    // match each other (n_bands differs in the equi-key), so the
    // matched pair set is row-identical to the 3-arm union, and the
    // per-config distinct becomes one distinct over (n_bands, pair).
    // The DuckDB oracle KEEPS the three-CTE union form, re-proving
    // the fold cross-engine on every correctness run.
    val bandStructs = Seq(2, 4, 8).flatMap { nBands =>
      val rsize = NumHashes / nBands
      (0 until nBands).map { b =>
        struct(lit(nBands.toLong).as("n_bands"), lit(b).as("band_idx"),
          md5(concat_ws("|", (0 until rsize).map(r => col(mhCol(b * rsize + r))): _*))
            .as("band_hash"))
      }
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("k"))
      .select(col("doc_id"), col("k.n_bands").as("n_bands"),
        col("k.band_idx").as("band_idx"), col("k.band_hash").as("band_hash"))
    val tagged = bands.as("a")
      .join(bands.as("b"),
        col("a.n_bands") === col("b.n_bands") &&
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_bands").as("n_bands"))
      .distinct()
      .registerCache()
    val uniq = tagged.select("doc_a", "doc_b").distinct()
    val docs = ShingleStore.served(s, dir)
      .select("doc_id", "shingles").registerCache()
    val sh = docs.select(col("doc_id"), explode(col("shingles")).as("g"))
    val counts = docs.select(col("doc_id"), size(col("shingles")).as("nsh"))
    val shared = uniq
      .join(sh.as("sa"), uniq("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        uniq("doc_b") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val verdicts = uniq
      .join(shared, Seq("doc_a", "doc_b"), "left")
      .withColumn("shared", coalesce(col("shared"), lit(0L)))
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        when((col("shared") / (col("ca.nsh") + col("cb.nsh") - col("shared"))) >= 0.5,
          1L).otherwise(0L).as("dup"))
    val agg = tagged.join(verdicts, Seq("doc_a", "doc_b"))
      .groupBy("n_bands")
      .agg(count(lit(1)).as("n_candidates"), sum("dup").as("n_verified"))
    val spine = s.range(1)
      .select(explode(array(lit(2L), lit(4L), lit(8L))).as("n_bands"))
    spine.join(agg, Seq("n_bands"), "left")
      .select(col("n_bands"),
        expr(s"$NumHashes div n_bands").as("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"),
        expr("coalesce(n_verified, 0L) * 10000 div nullif(coalesce(n_candidates, 0L), 0)")
          .as("precision_bp"))
  }

  val d27LshTuningSql: String = {
    def bandSel(nb: Int): String = {
      val rsize = NumHashes / nb
      (0 until nb).map { b =>
        val cols = (0 until rsize).map(r => s"CAST(${mhCol(b * rsize + r)} AS VARCHAR)")
        s"SELECT doc_id, $b AS band_idx, md5(${cols.mkString(" || '|' || ")}) AS band_hash FROM sig"
      }.mkString("\n        UNION ALL ")
    }
    def pairsCte(nb: Int, out: String) = s"""$out AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, $nb AS n_bands
      FROM (${bandSel(nb)}) a JOIN (${bandSel(nb)}) b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)"""
    s"""
    WITH $signatureCte,
    ${pairsCte(2, "p2")},
    ${pairsCte(4, "p4")},
    ${pairsCte(8, "p8")},
    tagged AS (SELECT * FROM p2 UNION ALL SELECT * FROM p4
               UNION ALL SELECT * FROM p8),
    uniq AS (SELECT DISTINCT doc_a, doc_b FROM tagged),
    vtok AS (SELECT doc_id, $oracleTokens AS tokens FROM documents),
    sdocs AS (SELECT doc_id, $oracleShingles AS sh FROM vtok),
    e AS (SELECT doc_id, unnest(sh) AS g FROM sdocs),
    shared AS (
      SELECT doc_a, doc_b, count(*) AS shared
      FROM uniq
      JOIN e ea ON ea.doc_id = doc_a
      JOIN e eb ON eb.doc_id = doc_b AND ea.g = eb.g
      GROUP BY 1, 2),
    counts AS (SELECT doc_id, len(sh) AS nsh FROM sdocs),
    verd AS (
      SELECT u.doc_a, u.doc_b,
             CASE WHEN coalesce(shared.shared, 0)
                       / (ca.nsh + cb.nsh - coalesce(shared.shared, 0)) >= 0.5
                  THEN 1 ELSE 0 END AS dup
      FROM uniq u
      LEFT JOIN shared ON u.doc_a = shared.doc_a AND u.doc_b = shared.doc_b
      JOIN counts ca ON u.doc_a = ca.doc_id
      JOIN counts cb ON u.doc_b = cb.doc_id),
    agg AS (
      SELECT n_bands, count(*) AS n_candidates,
             CAST(sum(dup) AS BIGINT) AS n_verified
      FROM tagged JOIN verd USING (doc_a, doc_b) GROUP BY 1),
    spine AS (SELECT unnest([2, 4, 8]) AS n_bands)
    SELECT CAST(n_bands AS BIGINT) AS n_bands,
           CAST($NumHashes // n_bands AS BIGINT) AS rows_per_band,
           coalesce(n_candidates, 0) AS n_candidates,
           coalesce(n_verified, 0) AS n_verified,
           coalesce(n_verified, 0) * 10000
             // nullif(coalesce(n_candidates, 0), 0) AS precision_bp
    FROM spine LEFT JOIN agg USING (n_bands)"""
  }

  val queries: Map[String, Q] = Map(
    "d27_lsh_tuning" -> d27LshTuning,
    "d26_sorted_neighborhood" -> d26SortedNeighborhood,
    "d25_boilerplate_strip" -> d25BoilerplateStrip,
    "d24_repeat_trim" -> d24RepeatTrim,
    "d23_fuzzy_name_match" -> d23FuzzyNameMatch,
    "d22_cluster_agreement" -> d22ClusterAgreement,
    "d21_source_overlap" -> d21SourceOverlap,
    "d20_bloom_decontaminate" -> d20BloomDecontaminate,
    "d18_minhash_accuracy" -> d18MinhashAccuracy,
    "d17_span_dedup" -> d17SpanDedup,
    "d16_containment" -> d16Containment,
    "d15_incremental_dedup" -> d15IncrementalDedup,
    "d14_family_agreement" -> d14FamilyAgreement,
    "d13_prefix_join"      -> d13PrefixJoin,
    "d12_chunk_dedup"      -> d12ChunkDedup,
    "d11_lsh_verified"     -> d11LshVerified,
    "d10_survivorship"     -> d10Survivorship,
    "d1_exact_dedup"       -> d1ExactDedup,
    "d2_minhash_signature" -> d2MinhashSignature,
    "d3_lsh_pairs"         -> d3LshPairs,
    "d4_simhash"           -> d4Simhash,
    "d5_ngram_jaccard"     -> d5NgramJaccard,
    "d6_simhash_hamming"   -> d6SimhashHamming,
    "d7_jaccard_prefiltered" -> d7JaccardPrefiltered,
    "d8_dup_clusters"      -> d8DupClusters,
    "d9_semantic_clusters" -> d9SemanticClusters,
  )

  val oracleSql: Map[String, String] = Map(
    "d27_lsh_tuning" -> d27LshTuningSql,
    "d26_sorted_neighborhood" -> d26SortedNeighborhoodSql,
    "d25_boilerplate_strip" -> d25BoilerplateStripSql,
    "d24_repeat_trim" -> d24RepeatTrimSql,
    "d23_fuzzy_name_match" -> d23FuzzyNameMatchSql,
    "d22_cluster_agreement" -> d22ClusterAgreementSql,
    "d21_source_overlap" -> d21SourceOverlapSql,
    "d20_bloom_decontaminate" -> d20BloomDecontaminateSql,
    "d18_minhash_accuracy" -> d18MinhashAccuracySql,
    "d17_span_dedup" -> d17SpanDedupSql,
    "d16_containment" -> d16ContainmentSql,
    "d15_incremental_dedup" -> d15IncrementalDedupSql,
    "d14_family_agreement" -> d14FamilyAgreementSql,
    "d13_prefix_join"      -> d13PrefixJoinSql,
    "d12_chunk_dedup"      -> d12ChunkDedupSql,
    "d11_lsh_verified"     -> d11LshVerifiedSql,
    "d10_survivorship"     -> d10SurvivorshipSql,
    "d1_exact_dedup"       -> d1ExactDedupSql,
    "d2_minhash_signature" -> d2MinhashSignatureSql,
    "d3_lsh_pairs"         -> d3LshPairsSql,
    "d4_simhash"           -> d4SimhashSql,
    "d5_ngram_jaccard"     -> d5NgramJaccardSql,
    "d6_simhash_hamming"   -> d6SimhashHammingSql,
    "d7_jaccard_prefiltered" -> d7JaccardPrefilteredSql,
    "d8_dup_clusters"      -> d8DupClustersSql,
    "d9_semantic_clusters" -> d9SemanticClustersSql,
  )
}
