package graft.sim

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Caching.RegisterSyntax
import graft.core.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline and a
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Cross-engine exactness trick: components are quantized to integer
  * millionths, so dot products and squared norms are exact int64
  * arithmetic — identical in Spark and DuckDB regardless of summation
  * order — and the only floating-point step is a final
  * `dot / sqrt(na*nb)` on identical integers, which is bit-stable.
  * (Magnitudes: |q| ≤ ~1e6 ⇒ dot ≤ 64·1e12 ≈ 6.4e13 per pair, far
  * inside int64; na·nb is computed in double to avoid the 1e27
  * overflow.)
  *
  * Scale notes (100 TB): brute force is O(Q·N) and exists as the
  * correctness baseline; the LSH path buckets vectors with 8
  * deterministic hyperplanes (256 buckets) so candidate generation is
  * one shuffle on the bucket id and the per-bucket join is bounded.
  * At 1000 executors you'd raise the plane count so buckets stay
  * executor-sized, and pre-partition the corpus by bucket.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64
  private val NumPlanes = 8
  private val Scale = 1000000L

  /** Ceiling for a FORCED broadcast of a bounded-by-construction frame
    * (the s12 serve's |q|·k candidate set): 256 MB of estimated payload
    * is comfortable for the multi-GB driver heaps the target profile
    * runs, far above autoBroadcastJoinThreshold's row-estimate
    * conservatism, and far below the OOM line a row-count bound could
    * cross when each row carries a full quantized vector. */
  private val MaxPinnedBroadcastBytes = 256L << 20

  /** Deterministic ±1 hyperplane matrix derived from md5("p:d") —
    * reproducible constants, embedded literally in both dialects.
    */
  private[sim] val planes: Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until NumPlanes).map { p =>
      (0 until Dim).map { d =>
        val h = md.digest(s"$p:$d".getBytes(StandardCharsets.UTF_8))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  /** vec_id, label, qv (int64 millionths), n2 (int64 squared norm). */
  private[graft] def quantized(s: SparkSession, dir: String): DataFrame =
    quantizedOf(Tables.loadParallel(s, dir, "embeddings"))

  /** The quantization applied to any embeddings-shaped slice (the
    * incremental tiers quantize delta files alone). */
  private[graft] def quantizedOf(df: DataFrame): DataFrame =
    df.withColumn("qv",
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) as bigint))"))
      .withColumn("n2", graft.plans.LongArrayDot.dot(col("qv"), col("qv")))

  private val oracleQuantized: String = s"""
    q AS (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(round(x::DOUBLE * $Scale) AS BIGINT)) AS qv
          FROM embeddings),
    qn AS (SELECT vec_id, label, qv,
             list_aggregate(list_transform(qv, x -> x*x), 'sum') AS n2
           FROM q)"""

  private[sim] def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  // =========================================================================
  // s1 — brute-force cosine top-k (exact ANN baseline)
  // =========================================================================

  /** Every 50th vector is a "query"; top-5 neighbors by quantized
    * cosine, ties broken on neighbor id. Broadcast the small query side
    * — the corpus never shuffles.
    */
  val s1CosineTopk: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val scored = broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("q_n2"), col("n2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  val s1CosineTopkSql: String = s"""
    WITH $oracleQuantized,
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2 FROM qn
                WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE) AS cos_sim
      FROM queries JOIN qn ON query_id <> vec_id),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 5"""

  // =========================================================================
  // s2 — LSH bucket assignment (the scale path's partitioning key)
  // =========================================================================

  private def sparkBucketExpr: String =
    (0 until NumPlanes).map { p =>
      val lit = planes(p).mkString(",")
      s"(case when long_array_dot(qv, cast(array($lit) as array<bigint>)) >= 0 then ${1 << p} else 0 end)"
    }.mkString(" + ")

  private def duckBucketExpr: String =
    (0 until NumPlanes).map { p =>
      val lit = planes(p).mkString(",")
      s"(case when list_aggregate(list_transform(range(1, $Dim + 1), i -> list_extract(qv, i) * list_extract([$lit], i)), 'sum') >= 0 then ${1 << p} else 0 end)"
    }.mkString(" + ")

  val s2LshBuckets: Q = (s, dir) =>
    quantized(s, dir)
      .select(col("vec_id"), expr(s"cast($sparkBucketExpr as int)").as("bucket"))

  val s2LshBucketsSql: String = s"""
    WITH $oracleQuantized
    SELECT vec_id, CAST($duckBucketExpr AS INTEGER) AS bucket FROM qn"""

  // =========================================================================
  // s3 — bucketed ANN: top-3 within the query's LSH bucket
  // =========================================================================

  /** The approximate variant: candidates = same-bucket vectors only.
    * One shuffle on bucket id; per-bucket fan-out is N/256 on random
    * data instead of N.
    */
  val s3AnnBucketed: Q = (s, dir) => {
    val b = quantized(s, dir)
      .withColumn("bucket", expr(s"cast($sparkBucketExpr as int)"))
    val queries = b.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("bucket"))
    val scored = queries
      .join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("q_n2"), col("n2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("bucket"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  val s3AnnBucketedSql: String = s"""
    WITH $oracleQuantized,
    b AS (SELECT vec_id, qv, n2, CAST($duckBucketExpr AS INTEGER) AS bucket FROM qn),
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, bucket FROM b
                WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, q.bucket, vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE) AS cos_sim
      FROM queries q JOIN b USING (bucket) WHERE query_id <> vec_id),
    ranked AS (
      SELECT query_id, bucket, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, bucket, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 3"""

  // =========================================================================
  // s4 — embedding near-duplicate pairs (cosine threshold, label-blocked)
  // =========================================================================

  /** Near-dup pairs within a label block at cosine ≥ 0.4. Label
    * blocking is the same bounded-candidate idea as d5's language
    * blocks; at scale the block key would be the LSH bucket instead.
    */
  /** s4's near-dup threshold — shared with the incremental tier merge
    * so the two pair generators cannot drift. */
  private[graft] val NeardupMinCos = 0.4

  val s4EmbeddingNeardup: Q = (s, dir) => {
    val e = quantized(s, dir)
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("a.qv"), col("b.qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("a.n2"), col("b.n2")))
      .filter(col("cos_sim") >= NeardupMinCos)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos_sim"))
  }

  /** s4's pair contract restricted to pairs touching `delta`
    * (quantized rows): label-blocked candidates, the same quantized
    * cosine, the same threshold, canonical `doc_a < doc_b`. Because
    * quantization and the label block are per-vector, old×old pairs
    * cannot change under append-only growth — this IS the complete
    * new-pair set, the property `ClusterStore`'s incremental
    * components merge rests on. */
  private[graft] def neardupPairsTouching(delta: DataFrame,
                                          all: DataFrame): DataFrame =
    delta.as("n").join(all.as("c"),
        col("n.label") === col("c.label") && col("n.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("n.qv"), col("c.qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("n.n2"), col("c.n2")))
      .filter(col("cos_sim") >= NeardupMinCos)
      .select(least(col("n.vec_id"), col("c.vec_id")).as("doc_a"),
        greatest(col("n.vec_id"), col("c.vec_id")).as("doc_b"))
      .distinct()

  val s4EmbeddingNeardupSql: String = s"""
    WITH $oracleQuantized,
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(a.qv, i) * list_extract(b.qv, i)), 'sum')::DOUBLE
               / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cos_sim
      FROM qn a JOIN qn b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.4"""

  // =========================================================================

  // =========================================================================
  // s5 — IVF-style ANN: coarse quantizer + probe-own-cell
  // =========================================================================

  /** Inverted-file ANN with a deterministic coarse quantizer: every
    * 125th vector is a centroid, each vector is assigned to its
    * highest-cosine centroid (ties to the lower centroid id), and a
    * query probes only its own cell — the IVF nprobe=1 shape. At scale
    * the centroid set is broadcast (it is tiny by construction), cell
    * assignment is a map stage over the corpus, and the probe join
    * shuffles on cell id; a production build would replace the sampled
    * centroids with k-means and raise nprobe.
    */
  val s5IvfAnn: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val assigned = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("qv"), col("n2"), col("c_id").as("cell"))
    val queries = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("cell"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    queries.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cell"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  val s5IvfAnnSql: String = s"""
    WITH $oracleQuantized,
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, qn.qv, qn.n2, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    assigned AS (
      SELECT vec_id, qv, n2, c_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, c_id) AS rn
        FROM scored_cells) WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, cell
                FROM assigned WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, q.cell, a.vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(a.qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * a.n2::DOUBLE) AS cos_sim
      FROM queries q JOIN assigned a USING (cell)
      WHERE query_id <> a.vec_id),
    ranked AS (
      SELECT query_id, cell, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, cell, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 3"""

  // =========================================================================
  // s6 — multiprobe IVF: nprobe=2, the recall/cost knob
  // =========================================================================

  /** s5 with the production recall knob turned: each query probes its
    * TWO highest-cosine cells instead of one, recovering neighbors
    * that fell just across a cell boundary (the dominant IVF recall
    * failure). Corpus storage is unchanged (each vector still lives in
    * exactly one cell, so the union of probe candidates is
    * duplicate-free by construction); query cost doubles, corpus cost
    * doesn't. The probe list and the candidate join both shuffle on
    * cell id — the same partitioning s5 already pays.
    */
  val s6MultiprobeAnn: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val rankedCells = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wCell))
    val assigned = rankedCells.filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("n2"), col("c_id").as("cell"))
    val probes = rankedCells
      .filter(col("rn") <= 2 && col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("c_id").as("cell"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  val s6MultiprobeAnnSql: String = s"""
    WITH $oracleQuantized,
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, qn.qv, qn.n2, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    ranked_cells AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY c_cos DESC, c_id) AS rn
      FROM scored_cells),
    assigned AS (SELECT vec_id, qv, n2, c_id AS cell
                 FROM ranked_cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, c_id AS cell
               FROM ranked_cells WHERE rn <= 2 AND vec_id % 50 = 0),
    scored AS (
      SELECT query_id, a.vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(a.qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * a.n2::DOUBLE) AS cos_sim
      FROM probes q JOIN assigned a USING (cell)
      WHERE query_id <> a.vec_id),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 3"""

  // =========================================================================
  // s7 — per-vector stats via higher-order array functions
  // =========================================================================

  /** Vector hygiene stats (norm, sign balance, peak component) computed
    * entirely with codegen'd higher-order functions — `transform` /
    * `aggregate` / `filter` — no UDF, no explode, zero shuffle. The
    * norm is summed in integer micros after per-element milli
    * quantization (the s-family's cross-engine exactness discipline),
    * so a whole-corpus scan of this shape at 100 TB is a pure map
    * stage.
    */
  // NOTE the cast(x as double) BEFORE the ×1000: the embedding is
  // float32, and multiplying in single precision puts boundary values
  // (….4999 vs ….5001) on different sides of round() in the two
  // engines — caught by the sf0.1 validation sweep, invisible at
  // sf0.01. Widening first is the same discipline as [[quantized]].
  val s7VectorStats: Q = (s, dir) =>
    graft.core.Tables.loadParallel(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("aggregate(transform(embedding, x -> cast(round(cast(x as double)*1000) as bigint))," +
             " 0L, (acc, x) -> acc + x*x)").as("norm2_micro"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        expr("array_max(transform(embedding, x -> cast(round(cast(x as double)*1000) as bigint)))")
          .as("max_milli"))

  val s7VectorStatsSql: String = """
    SELECT vec_id,
           CAST(list_aggregate(list_transform(embedding,
                  x -> CAST(round(x::DOUBLE*1000) AS BIGINT) * CAST(round(x::DOUBLE*1000) AS BIGINT)),
                'sum') AS BIGINT) AS norm2_micro,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           list_max(list_transform(embedding, x -> CAST(round(x::DOUBLE*1000) AS BIGINT))) AS max_milli
    FROM embeddings"""

  // =========================================================================
  // s8 — ANN recall evaluation: bucketed candidates vs the exact baseline
  // =========================================================================

  /** Recall@3 of the LSH-bucketed ANN (s3) against the brute-force
    * truth (s1) per query — the evaluation every approximate index
    * needs before it replaces the exact path in production. An ANN
    * family without a measured recall is a latency number with no
    * quality denominator; this runs the measurement as a QUERY, so the
    * recall/cost trade-off (bucket bits, nprobe) is tunable against
    * data, not intuition. Exact hits join on (query, neighbor); recall
    * lands in integer basis points. Both inputs reuse the family's
    * persisted-quantization plans; the join keys are query-grain, so
    * the whole evaluation is one small shuffle over |queries|·k rows.
    *
    * On the synthetic fixtures this measures ~0 recall — isotropic
    * random vectors have no cluster structure, so a single 8-bit
    * hyperplane bucket almost never contains the true top-3. That is
    * the evaluation working as intended: it is precisely the number
    * that justifies multiprobe (s6) and IVF (s5) over naive bucketing,
    * and on real (clustered) embeddings it is the dial that sets the
    * bucket-bits/nprobe trade.
    */
  val s8AnnRecall: Q = (s, dir) => {
    val exact = s1CosineTopk(s, dir).filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"))
    val approx = s3AnnBucketed(s, dir)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    exact.join(approx,
        col("query_id") === col("aq") && col("neighbor_id") === col("an"),
        "left_outer")
      .groupBy("query_id")
      .agg(count(col("an")).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits") * 10000L / lit(3)).cast("long").as("recall_bp"))
  }

  val s8AnnRecallSql: String = s"""
    SELECT e.query_id, count(a.neighbor_id) AS hits,
           CAST(count(a.neighbor_id) * 10000 // 3 AS BIGINT) AS recall_bp
    FROM (SELECT query_id, neighbor_id FROM ($s1CosineTopkSql) WHERE rank <= 3) e
    LEFT JOIN (SELECT query_id, neighbor_id FROM ($s3AnnBucketedSql)) a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id"""

  // =========================================================================
  // s9 — scalar-quantized (int8) scan + exact re-rank
  // =========================================================================

  private val SqCandidates = 20

  /** The quantization member of the ANN family: every vector stores
    * an int8 code (symmetric per-vector scale, `round(x·127/maxabs)`)
    * next to its exact form; the candidate scan ranks by the
    * quantized dot product and only the top `SqCandidates` per query
    * pay the exact-cosine re-rank — the memory-bandwidth play real
    * vector stores run (a 64-dim int8 code is 8× smaller than the
    * int64-micros exact form, so the scan reads an eighth of the
    * bytes; at 100 TB it composes with s5's IVF so the scan also
    * touches only nprobe cells).
    *
    * Determinism: the approximate key `dot8 × corpus_scale` is EXACT
    * INT64 arithmetic (the query's own scale multiplies all its
    * candidates equally and drops out of the ranking) — no float
    * enters until the re-rank, which reuses s1's quantized-cosine
    * (exact integer dot + one correctly-rounded division). Zero
    * vectors clamp scale to 1 (codes all-0, never a divide-by-zero).
    */
  val s9SqAnn: Q = (s, dir) => {
    val base = quantized(s, dir)
      .withColumn("scale8",
        greatest(expr("aggregate(qv, 0L, (a, x) -> greatest(a, abs(x)))"), lit(1L)))
      .withColumn("v8", expr(
        "transform(qv, x -> cast(round(cast(x as double) * 127.0" +
          " / cast(scale8 as double)) as bigint))"))
    val queries = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("v8").as("q_v8"))
    val approx = broadcast(queries)
      .join(base, col("query_id") =!= col("vec_id"))
      .withColumn("adot",
        graft.plans.LongArrayDot.dot(col("q_v8"), col("v8")) * col("scale8"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adot").desc, col("vec_id"))
    val wE = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    approx.withColumn("crank", row_number().over(wA))
      .filter(col("crank") <= SqCandidates)
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos_sim"))
  }

  val s9SqAnnSql: String = s"""
    WITH $oracleQuantized,
    sq AS (SELECT vec_id, qv, n2,
             greatest(list_aggregate(list_transform(qv, x -> abs(x)), 'max'), 1) AS scale8
           FROM qn),
    q8 AS (SELECT *, list_transform(qv,
             x -> CAST(round(x::DOUBLE * 127.0 / scale8::DOUBLE) AS BIGINT)) AS v8
           FROM sq),
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, v8 AS q_v8
                FROM q8 WHERE vec_id % 50 = 0),
    approx AS (
      SELECT query_id, vec_id, q_qv, q_n2, qv, n2,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_v8, i) * list_extract(v8, i)), 'sum')
               * scale8 AS adot
      FROM queries JOIN q8 ON query_id <> vec_id),
    cand AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adot DESC, vec_id) AS crank
      FROM approx),
    exact AS (
      SELECT query_id, vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE) AS cos_sim
      FROM cand WHERE crank <= $SqCandidates),
    ranked AS (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM exact)
    SELECT query_id, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 5"""

  // =========================================================================
  // s11 — integer-exact distributed k-means (Lloyd, fixed rounds)
  // =========================================================================

  /** K-means over the embedding corpus with every step in int64
    * arithmetic, so the notoriously order-dependent float Lloyd loop
    * becomes bit-reproducible across engines: components are offset to
    * positive millionths (distances are offset-invariant; positivity
    * makes Spark's `div` and DuckDB's `//` agree — they differ on
    * negatives), centroid update is per-dim `sum div count`, and
    * assignment argmin is `min(dist2*16 + cid)` — one bigint min, ties
    * to the lower centroid id.
    *
    * Scale shape: the codebook (k=8 rows) lives in ONE collected-array
    * row, broadcast; assignment is a pure map stage (no crossJoin at
    * the vector grain, no per-vector groupBy — the argmin folds over
    * the in-row codebook array). Each update is one map-side-combined
    * aggregate to k rows with 64 per-dim sums — the classic
    * distributed-k-means reduce. 2 Lloyd rounds + a final E-step,
    * unrolled into one lazy plan, no driver iteration.
    */
  private val KmOffset = 1000000L

  private def kmVectors(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "embeddings")
      .withColumn("ov",
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) as bigint) + $KmOffset)"))
      .select("vec_id", "ov")

  /** One row: the k centroids as a sorted array of (cid, cv) structs. */
  private def kmPack(centroids: DataFrame): DataFrame =
    centroids.agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))

  /** Map-stage E-step: argmin over the broadcast in-row codebook. */
  private def kmAssign(vectors: DataFrame, packed: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(packed))
      .withColumn("mk", expr(
        """array_min(transform(cents, c ->
             aggregate(zip_with(ov, c.cv, (x, y) -> (x - y) * (x - y)),
                       cast(0 as bigint), (a, x) -> a + x) * 16 + c.cid))"""))
      .select(col("vec_id"), col("ov"),
        expr("mk % 16").as("cid"), expr("mk div 16").as("d2"))

  /** M-step: per-dim integer mean, one aggregate to k rows. */
  private def kmUpdate(assigned: DataFrame): DataFrame = {
    val grouped = assigned.groupBy("cid")
      .agg(count(lit(1)).as("n"), sum(expr("element_at(ov, 1)")).as("s1"), sum(expr("element_at(ov, 2)")).as("s2"), sum(expr("element_at(ov, 3)")).as("s3"), sum(expr("element_at(ov, 4)")).as("s4"), sum(expr("element_at(ov, 5)")).as("s5"), sum(expr("element_at(ov, 6)")).as("s6"), sum(expr("element_at(ov, 7)")).as("s7"), sum(expr("element_at(ov, 8)")).as("s8"), sum(expr("element_at(ov, 9)")).as("s9"), sum(expr("element_at(ov, 10)")).as("s10"), sum(expr("element_at(ov, 11)")).as("s11"), sum(expr("element_at(ov, 12)")).as("s12"), sum(expr("element_at(ov, 13)")).as("s13"), sum(expr("element_at(ov, 14)")).as("s14"), sum(expr("element_at(ov, 15)")).as("s15"), sum(expr("element_at(ov, 16)")).as("s16"), sum(expr("element_at(ov, 17)")).as("s17"), sum(expr("element_at(ov, 18)")).as("s18"), sum(expr("element_at(ov, 19)")).as("s19"), sum(expr("element_at(ov, 20)")).as("s20"), sum(expr("element_at(ov, 21)")).as("s21"), sum(expr("element_at(ov, 22)")).as("s22"), sum(expr("element_at(ov, 23)")).as("s23"), sum(expr("element_at(ov, 24)")).as("s24"), sum(expr("element_at(ov, 25)")).as("s25"), sum(expr("element_at(ov, 26)")).as("s26"), sum(expr("element_at(ov, 27)")).as("s27"), sum(expr("element_at(ov, 28)")).as("s28"), sum(expr("element_at(ov, 29)")).as("s29"), sum(expr("element_at(ov, 30)")).as("s30"), sum(expr("element_at(ov, 31)")).as("s31"), sum(expr("element_at(ov, 32)")).as("s32"), sum(expr("element_at(ov, 33)")).as("s33"), sum(expr("element_at(ov, 34)")).as("s34"), sum(expr("element_at(ov, 35)")).as("s35"), sum(expr("element_at(ov, 36)")).as("s36"), sum(expr("element_at(ov, 37)")).as("s37"), sum(expr("element_at(ov, 38)")).as("s38"), sum(expr("element_at(ov, 39)")).as("s39"), sum(expr("element_at(ov, 40)")).as("s40"), sum(expr("element_at(ov, 41)")).as("s41"), sum(expr("element_at(ov, 42)")).as("s42"), sum(expr("element_at(ov, 43)")).as("s43"), sum(expr("element_at(ov, 44)")).as("s44"), sum(expr("element_at(ov, 45)")).as("s45"), sum(expr("element_at(ov, 46)")).as("s46"), sum(expr("element_at(ov, 47)")).as("s47"), sum(expr("element_at(ov, 48)")).as("s48"), sum(expr("element_at(ov, 49)")).as("s49"), sum(expr("element_at(ov, 50)")).as("s50"), sum(expr("element_at(ov, 51)")).as("s51"), sum(expr("element_at(ov, 52)")).as("s52"), sum(expr("element_at(ov, 53)")).as("s53"), sum(expr("element_at(ov, 54)")).as("s54"), sum(expr("element_at(ov, 55)")).as("s55"), sum(expr("element_at(ov, 56)")).as("s56"), sum(expr("element_at(ov, 57)")).as("s57"), sum(expr("element_at(ov, 58)")).as("s58"), sum(expr("element_at(ov, 59)")).as("s59"), sum(expr("element_at(ov, 60)")).as("s60"), sum(expr("element_at(ov, 61)")).as("s61"), sum(expr("element_at(ov, 62)")).as("s62"), sum(expr("element_at(ov, 63)")).as("s63"), sum(expr("element_at(ov, 64)")).as("s64"))
    grouped.select(col("cid"), array(expr("s1 div n"), expr("s2 div n"), expr("s3 div n"), expr("s4 div n"), expr("s5 div n"), expr("s6 div n"), expr("s7 div n"), expr("s8 div n"), expr("s9 div n"), expr("s10 div n"), expr("s11 div n"), expr("s12 div n"), expr("s13 div n"), expr("s14 div n"), expr("s15 div n"), expr("s16 div n"), expr("s17 div n"), expr("s18 div n"), expr("s19 div n"), expr("s20 div n"), expr("s21 div n"), expr("s22 div n"), expr("s23 div n"), expr("s24 div n"), expr("s25 div n"), expr("s26 div n"), expr("s27 div n"), expr("s28 div n"), expr("s29 div n"), expr("s30 div n"), expr("s31 div n"), expr("s32 div n"), expr("s33 div n"), expr("s34 div n"), expr("s35 div n"), expr("s36 div n"), expr("s37 div n"), expr("s38 div n"), expr("s39 div n"), expr("s40 div n"), expr("s41 div n"), expr("s42 div n"), expr("s43 div n"), expr("s44 div n"), expr("s45 div n"), expr("s46 div n"), expr("s47 div n"), expr("s48 div n"), expr("s49 div n"), expr("s50 div n"), expr("s51 div n"), expr("s52 div n"), expr("s53 div n"), expr("s54 div n"), expr("s55 div n"), expr("s56 div n"), expr("s57 div n"), expr("s58 div n"), expr("s59 div n"), expr("s60 div n"), expr("s61 div n"), expr("s62 div n"), expr("s63 div n"), expr("s64 div n")).as("cv"))
  }

  /** The full 2-round Lloyd chain ending in a final E-step: ONE lazy
    * plan producing (vec_id, ov, cid, d2). Shared by s11 (the k-means
    * surface) and d19 (SemDeDup's cluster assignment).
    */
  private def kmFinalAssign(s: SparkSession, dir: String): DataFrame = {
    // persisted: the quantized vectors feed c0 plus all three unrolled
    // E-steps — uncached, each round's centroid lineage re-scans the
    // embeddings table (the honest ScanCount capture read 3 scans for
    // d19; one cached build is the g5 per-round discipline)
    val vs = kmVectors(s, dir).registerCache()
    val c0 = vs.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("ov").as("cv"))
    val c1 = kmUpdate(kmAssign(vs, kmPack(c0)))
    val c2 = kmUpdate(kmAssign(vs, kmPack(c1)))
    kmAssign(vs, kmPack(c2))
  }

  val s11Kmeans: Q = (s, dir) => {
    kmFinalAssign(s, dir)
      .select(col("vec_id"), col("cid").as("cluster"), col("d2"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
  }

  /** The CTE chain (everything after WITH, ending in assignment `a3`)
    * shared by s11's and d19's oracles. */
  private lazy val kmSqlWithBody: String = {
    def assign(cents: String, out: String) =
      s"""$out AS (
        SELECT vec_id, ov, mk % 16 AS cid, mk // 16 AS d2 FROM (
          SELECT vec_id, ov,
                 CAST(list_min(list_transform(cents, c ->
                   list_aggregate(list_transform(range(1, $Dim + 1),
                     i -> (ov[i] - struct_extract(c, 'cv')[i])
                        * (ov[i] - struct_extract(c, 'cv')[i])), 'sum')
                   * 16 + struct_extract(c, 'cid'))) AS BIGINT) AS mk
          FROM ov CROSS JOIN $cents))"""
    def update(assigned: String, out: String) =
      s"""$out AS (
        SELECT cid,
               [CAST(SUM(ov[1]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[2]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[3]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[4]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[5]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[6]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[7]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[8]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[9]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[10]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[11]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[12]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[13]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[14]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[15]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[16]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[17]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[18]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[19]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[20]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[21]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[22]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[23]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[24]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[25]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[26]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[27]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[28]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[29]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[30]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[31]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[32]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[33]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[34]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[35]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[36]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[37]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[38]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[39]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[40]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[41]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[42]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[43]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[44]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[45]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[46]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[47]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[48]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[49]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[50]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[51]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[52]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[53]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[54]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[55]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[56]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[57]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[58]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[59]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[60]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[61]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[62]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[63]) // COUNT(*) AS BIGINT),
                 CAST(SUM(ov[64]) // COUNT(*) AS BIGINT)] AS cv
        FROM $assigned GROUP BY cid)"""
    def pack(centroids: String, out: String) =
      s"$out AS (SELECT list(struct_pack(cid := cid, cv := cv) ORDER BY cid) AS cents FROM $centroids)"
    s"""ov AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * $Scale) AS BIGINT) + $KmOffset) AS ov
      FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cid, ov AS cv FROM ov WHERE vec_id < 8),
    ${pack("c0", "p0")},
    ${assign("p0", "a1")},
    ${update("a1", "c1")},
    ${pack("c1", "p1")},
    ${assign("p1", "a2")},
    ${update("a2", "c2")},
    ${pack("c2", "p2")},
    ${assign("p2", "a3")}"""
  }

  val s11KmeansSql: String = s"""
    WITH $kmSqlWithBody
    SELECT vec_id, cid AS cluster, d2,
           count(*) OVER (PARTITION BY cid) AS cluster_size
    FROM a3"""

  // =========================================================================
  // d19 — SemDeDup: semantic dedup inside k-means clusters
  // =========================================================================

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embed, cluster,
    * then drop any document whose cosine similarity to a lower-id
    * member of the SAME cluster reaches the epsilon threshold — the
    * one-pass "dominated by an earlier member" approximation
    * production pipelines use in place of transitive greedy selection
    * (which would need iteration). Cluster assignment is s11's
    * integer-exact 2-round Lloyd chain, so the clusters — and hence
    * the survivor set — are bit-identical in Spark and DuckDB; the
    * cosine is the quantized-int64 dot (s1's trick), bit-stable.
    *
    * Output: one row per vector — its cluster, and for dropped docs
    * the lowest dominating neighbor id (`dup_of`; null = survivor).
    *
    * Scale shape: the pairwise join is confined WITHIN clusters — one
    * shuffle keyed on cluster id, never corpus×corpus. At 100 TB, k
    * grows with the corpus (k ≈ N / target cell size, SemDeDup used
    * 50k clusters for LAION) so each cell stays executor-sized. The
    * assignment chain is computed once, cached, and read by both join
    * sides and the final survivor join.
    */
  // 0.4 matches s4's near-dup bar and drops ~5% of the synthetic
  // corpus (24/500 at sf0.01) — a realistic SemDeDup rate; 0.5 finds
  // only 1 pair in this data and would gate nothing.
  private val SemThreshold = 0.4

  val d19Semdedup: Q = (s, dir) => {
    val vn = kmFinalAssign(s, dir)
      .withColumn("qv", expr(s"transform(ov, x -> x - $KmOffset)"))
      .withColumn("n2", graft.plans.LongArrayDot.dot(col("qv"), col("qv")))
      .select(col("vec_id"), col("cid").as("cluster"), col("qv"), col("n2"))
      .registerCache()
    val dups = vn.as("a")
      .join(vn.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("a.qv"), col("b.qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("a.n2"), col("b.n2")))
      .filter(col("cos_sim") >= SemThreshold)
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(min(col("a.vec_id")).as("dup_of"))
    vn.join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"), col("dup_of"))
  }

  val d19SemdedupSql: String = s"""
    WITH $kmSqlWithBody,
    vn AS (
      SELECT vec_id, cid AS cluster,
             list_transform(ov, x -> x - $KmOffset) AS qv
      FROM a3),
    vnn AS (
      SELECT vec_id, cluster, qv,
             list_aggregate(list_transform(qv, x -> x*x), 'sum') AS n2
      FROM vn),
    dups AS (
      SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
      FROM vnn a JOIN vnn b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_aggregate(list_transform(range(1, $Dim + 1),
              i -> list_extract(a.qv, i) * list_extract(b.qv, i)), 'sum')::DOUBLE
            / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) >= $SemThreshold
      GROUP BY b.vec_id)
    SELECT v.vec_id, v.cluster, d.dup_of
    FROM vnn v LEFT JOIN dups d ON v.vec_id = d.vec_id"""

  // =========================================================================
  // s10 — product quantization ANN (learned codebooks + ADC scan)
  // =========================================================================

  /** PQ in the Jégou et al. (2011) shape, integer-exact end to end:
    * 4 subspaces × 16 dims, an 8-code codebook per subspace learned by
    * one integer Lloyd round (s11's arithmetic on subvectors), each
    * corpus vector encoded as 4 codes, and queries scanning via
    * asymmetric distance — Σ over subspaces of a 32-entry
    * query-to-centroid LUT — then an exact-cosine re-rank of the top
    * 20 ADC candidates (s9's discipline: the approximation proposes,
    * exact arithmetic ranks).
    *
    * Scale shape: codebooks and LUTs are tiny broadcasts (k·M rows);
    * encoding is a map stage over the subvector frame; the ADC scan
    * is one broadcast-hash-join + a (query,vec) map-combined sum —
    * the memory win at 100 TB is the point: the scan touches 4 bytes
    * of codes per vector, not 64 floats, and composes with s5's IVF
    * cells exactly like s9's int8 scan.
    */
  private def pqSubs(vs: DataFrame): DataFrame =
    vs.select(col("vec_id"), explode(expr("sequence(0, 3)")).as("m"), col("ov"))
      .withColumn("sv", expr("slice(ov, m * 16 + 1, 16)"))
      .select("vec_id", "m", "sv")

  private def pqPack(cb: DataFrame): DataFrame =
    cb.groupBy("m")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))

  private def pqAssign(subs: DataFrame, packed: DataFrame): DataFrame =
    subs.join(broadcast(packed), "m")
      .withColumn("mk", expr(
        """array_min(transform(cents, c ->
             aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)),
                       cast(0 as bigint), (a, x) -> a + x) * 16 + c.cid))"""))
      .select(col("vec_id"), col("m"), col("sv"),
        expr("mk % 16").as("cid"), expr("mk div 16").as("d2"))

  private def pqUpdate(assigned: DataFrame): DataFrame =
    assigned.groupBy("m", "cid")
      .agg(count(lit(1)).as("n"), sum(expr("element_at(sv, 1)")).as("s1"), sum(expr("element_at(sv, 2)")).as("s2"), sum(expr("element_at(sv, 3)")).as("s3"), sum(expr("element_at(sv, 4)")).as("s4"), sum(expr("element_at(sv, 5)")).as("s5"), sum(expr("element_at(sv, 6)")).as("s6"), sum(expr("element_at(sv, 7)")).as("s7"), sum(expr("element_at(sv, 8)")).as("s8"), sum(expr("element_at(sv, 9)")).as("s9"), sum(expr("element_at(sv, 10)")).as("s10"), sum(expr("element_at(sv, 11)")).as("s11"), sum(expr("element_at(sv, 12)")).as("s12"), sum(expr("element_at(sv, 13)")).as("s13"), sum(expr("element_at(sv, 14)")).as("s14"), sum(expr("element_at(sv, 15)")).as("s15"), sum(expr("element_at(sv, 16)")).as("s16"))
      .select(col("m"), col("cid"), array(expr("s1 div n"), expr("s2 div n"), expr("s3 div n"), expr("s4 div n"), expr("s5 div n"), expr("s6 div n"), expr("s7 div n"), expr("s8 div n"), expr("s9 div n"), expr("s10 div n"), expr("s11 div n"), expr("s12 div n"), expr("s13 div n"), expr("s14 div n"), expr("s15 div n"), expr("s16 div n")).as("cv"))

  val s10PqAdc: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val subs = pqSubs(kmVectors(s, dir)).registerCache()
    val c0 = subs.filter(col("vec_id") < 8)
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sv").as("cv"))
    val c1 = pqUpdate(pqAssign(subs, pqPack(c0)))
    val codes = pqAssign(subs, pqPack(c1)).select("vec_id", "m", "cid")
    val lut = subs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(c1), "m")
      .withColumn("qd2", expr(
        """aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)),
                     cast(0 as bigint), (a, x) -> a + x)"""))
      .select("query_id", "m", "cid", "qd2")
    val adc = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("qd2").as("adist2"))
    val cand = adc
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist2"), col("vec_id"))))
      .filter(col("crank") <= 20)
    val qn = quantized(s, dir).select("vec_id", "qv", "n2")
    cand
      .join(qn.select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2")), "query_id")
      .join(qn, "vec_id")
      .withColumn("cos_sim",
        cosine(graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")),
          col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adist2"), col("cos_sim"))
  }

  /** The PQ CTE chain (offset vectors → subvectors → 1-round learned
    * codebooks → corpus codes → query LUT) shared by s10's global ADC
    * scan and s12's IVF-restricted one. Defines `ov, sub, c0, p0, a1,
    * c1, p1, codes, lut`; expects `qn` (from [[oracleQuantized]]) in
    * scope for nothing — it is self-contained after `embeddings`.
    */
  private lazy val pqSqlChain: String = {
    def assign(cents: String, out: String, keep: String) =
      s"""$out AS (
        SELECT vec_id, m, sv, mk % 16 AS cid$keep FROM (
          SELECT s.vec_id, s.m, s.sv,
                 CAST(list_min(list_transform(cents, c ->
                   list_aggregate(list_transform(range(1, 16 + 1),
                     i -> (sv[i] - struct_extract(c, 'cv')[i])
                        * (sv[i] - struct_extract(c, 'cv')[i])), 'sum')
                   * 16 + struct_extract(c, 'cid'))) AS BIGINT) AS mk
          FROM sub s JOIN $cents USING (m)))"""
    s"""ov AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x::DOUBLE * $Scale) AS BIGINT) + $KmOffset) AS ov
      FROM embeddings),
    sub AS (
      SELECT vec_id, m, list_slice(ov, m * 16 + 1, m * 16 + 16) AS sv
      FROM ov, unnest([0, 1, 2, 3]) AS t(m)),
    c0 AS (SELECT m, CAST(vec_id AS INT) AS cid, sv AS cv FROM sub WHERE vec_id < 8),
    p0 AS (SELECT m, list(struct_pack(cid := cid, cv := cv) ORDER BY cid) AS cents
           FROM c0 GROUP BY m),
    ${assign("p0", "a1", "")},
    c1 AS (SELECT m, cid,
               [CAST(SUM(sv[1]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[2]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[3]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[4]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[5]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[6]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[7]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[8]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[9]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[10]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[11]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[12]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[13]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[14]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[15]) // COUNT(*) AS BIGINT),
                 CAST(SUM(sv[16]) // COUNT(*) AS BIGINT)] AS cv
           FROM a1 GROUP BY m, cid),
    p1 AS (SELECT m, list(struct_pack(cid := cid, cv := cv) ORDER BY cid) AS cents
           FROM c1 GROUP BY m),
    ${assign("p1", "codes", "")},
    lut AS (
      SELECT q.vec_id AS query_id, c1.m, c1.cid,
             CAST(list_aggregate(list_transform(range(1, 16 + 1),
               i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS BIGINT) AS qd2
      FROM sub q JOIN c1 USING (m)
      WHERE q.vec_id % 50 = 0)"""
  }

  val s10PqAdcSql: String = s"""
    WITH $oracleQuantized,
    $pqSqlChain,
    adc AS (
      SELECT query_id, vec_id, CAST(SUM(qd2) AS BIGINT) AS adist2
      FROM codes JOIN lut USING (m, cid)
      WHERE query_id <> vec_id
      GROUP BY 1, 2),
    cand AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adist2, vec_id) AS crank
      FROM adc),
    exact AS (
      SELECT c.query_id, c.vec_id, c.adist2,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qq.qv, i) * list_extract(nn.qv, i)), 'sum')::DOUBLE
               / sqrt(qq.n2::DOUBLE * nn.n2::DOUBLE) AS cos_sim
      FROM cand c
      JOIN qn qq ON c.query_id = qq.vec_id
      JOIN qn nn ON c.vec_id = nn.vec_id
      WHERE c.crank <= 20),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM exact)
    SELECT query_id, rank, vec_id AS neighbor_id, adist2, cos_sim
    FROM ranked WHERE rank <= 5"""

  // =========================================================================
  // s12 — IVF + PQ: the production ANN composition (IndexIVFPQ shape)
  // =========================================================================

  /** The FAISS `IndexIVFPQ` composition (Jégou et al. 2011; Johnson
    * et al. 2017): s5's coarse quantizer prunes the corpus to the
    * query's OWN cell, s10's learned PQ codebooks score only those
    * candidates via the asymmetric-distance LUT, and the top-10 ADC
    * survivors get an exact-cosine re-rank — approximation proposes,
    * exact arithmetic ranks (s9/s10's discipline).
    *
    * This is the query shape a 100 TB vector store actually serves:
    * per query, work = |cell| ADC lookups (4 code bytes each) + 10
    * exact re-ranks — NOT the corpus scan of s1/s9/s10. Both index
    * structures are one-time builds: cells are a map stage over a
    * broadcast centroid set, codes a map stage over broadcast
    * codebooks; the candidate join is keyed on (cell-restricted)
    * (m, cid) with the tiny LUT broadcast. Everything int64/
    * bit-stable end to end, so even the composed index hash-matches
    * the DuckDB twin.
    */
  val s12IvfPq: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val cells = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
      .registerCache()
    val subs = pqSubs(kmVectors(s, dir)).registerCache()
    val c0 = subs.filter(col("vec_id") < 8)
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sv").as("cv"))
    val c1 = pqUpdate(pqAssign(subs, pqPack(c0)))
    val codes = pqAssign(subs, pqPack(c1)).select("vec_id", "m", "cid")
      .join(cells, "vec_id")
    val lut = subs.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(c1), "m")
      .withColumn("qd2", expr(
        """aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)),
                     cast(0 as bigint), (a, x) -> a + x)"""))
      .select("query_id", "m", "cid", "qd2")
      .join(cells.select(col("vec_id").as("query_id"), col("cell").as("q_cell")),
        "query_id")
    val adc = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter(col("cell") === col("q_cell") && col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "cell", "vec_id")
      .agg(sum("qd2").as("adist2"))
    val cand = adc
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adist2"), col("vec_id"))))
      .filter(col("crank") <= 10)
    val qn = corpus.select("vec_id", "qv", "n2")
    cand
      .join(qn.select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2")), "query_id")
      .join(qn, "vec_id")
      .withColumn("cos_sim",
        cosine(graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")),
          col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("cell"), col("rank"),
        col("vec_id").as("neighbor_id"), col("adist2"), col("cos_sim"))
  }

  // -------------------------------------------------------------------------
  // s12 served from a snapshot-keyed PQ index (r9)
  // -------------------------------------------------------------------------

  /** Build the PQ-index artifact — s12's standing state as a directory
    * tier: the trained codebooks (4 subspaces × 16 centroids, one tiny
    * parquet) and each vector's PQ codes with its IVF cell (16 bytes
    * of state per vector in place of the raw 64-dim array). Every
    * stage is s12's own — deterministic id-elected init, one
    * integer-exact update round, the same cosine cell assignment — so
    * serving from the artifact reproduces the inline rows bit-for-bit. */
  private def pqIndexBuild(s: SparkSession, dir: String, path: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val cells = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
    val subs = pqSubs(kmVectors(s, dir)).registerCache()
    val c0 = subs.filter(col("vec_id") < 8)
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sv").as("cv"))
    val c1 = pqUpdate(pqAssign(subs, pqPack(c0)))
    c1.coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    // codes PACKED per vector — (vec_id, cell, cids[4] ordered by m):
    // the serve path reconstructs a candidate's ADC distance in one
    // map step from the broadcast LUT, so no per-(query,m) rows ever
    // form, let alone shuffle
    pqAssign(subs, pqPack(c1)).select("vec_id", "m", "cid")
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(m, cid))), e -> e.cid)")
        .as("cids"))
      .join(cells, "vec_id")
      .repartition(8, col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/codes")
    // record the corpus row count beside the artifacts: the serve path
    // sizes its broadcast-vs-shuffle decision from it without paying an
    // eager count() job per invocation (r10 advice). One count at build
    // is amortized into the index's own lifecycle.
    val n = s.read.parquet(s"$path/codes").count()
    val metaPath = new org.apache.hadoop.fs.Path(path, "_nrows")
    graft.io.Sidecar.write(
      metaPath.getFileSystem(s.sparkContext.hadoopConfiguration),
      metaPath, n.toString)
  }

  /** Corpus row count recorded at [[pqIndexBuild]]; a legacy version
    * without the sidecar falls back to one count() and WRITES THE
    * SIDECAR BACK beside the version (r11 verdict #5) — the codes are
    * immutable once committed, so the backfilled count can never lie,
    * and the next JVM reads the sidecar instead of re-counting.
    * Memoized per version path on top: even the fallback's job runs
    * once per JVM. */
  private val nrowsCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private[graft] def dropNrowsMemo(idx: String): Unit =
    nrowsCache.remove(idx): Unit
  private[graft] def indexRowCount(s: SparkSession, idx: String): Long =
    nrowsCache.getOrElseUpdate(idx, {
      val p = new org.apache.hadoop.fs.Path(idx, "_nrows")
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      graft.io.Sidecar.read(fs, p).map(_.trim.toLong).getOrElse {
        val n = s.read.parquet(s"$idx/codes").count()
        // best-effort backfill: a concurrent writer or read-only store
        // just means the next JVM pays the count again
        try graft.io.Sidecar.write(fs, p, n.toString)
        catch { case _: java.io.IOException => () }
        n
      }
    })

  /** The snapshot-keyed PQ index for this corpus, under
    * `DerivedStore.servedDir`'s fingerprint/OCC protocol: a
    * regenerated embeddings table rebuilds codebooks + codes instead
    * of silently serving stale ones.
    *
    * Deliberately FULL-rebuild-only (no `servedDirIncremental` merge,
    * unlike `media_ann`): the codebooks are k-means-trained over the
    * ENTIRE corpus's subvectors ([[pqIndexBuild]]'s update round), so
    * a rebuild over appended embeddings retrains them — an
    * append-with-frozen-codebooks version would encode the delta
    * against yesterday's geometry and silently diverge from the
    * recompute (and from the oracle, which retrains per snapshot).
    * There is no cheap precondition that restores append==rebuild
    * here; the honest incremental story for PQ is periodic re-train,
    * which IS the full build. */
  def s12Index(s: SparkSession, dir: String): String =
    graft.io.DerivedStore.servedDir(s, dir, "pq_index", Seq("embeddings"))(pqIndexBuild)

  /** Registry s12, SERVED from [[s12Index]]: codebook training, PQ
    * encoding and cell assignment happen once per embeddings snapshot
    * at index build — the query plan reads the artifact, computes the
    * |q|-sized ADC LUT, scans the stored CODES (16 bytes/vector of
    * state, never the raw vectors) and exact-re-ranks only the top-10
    * candidates. The inline [[s12IvfPq]] stays the spec's ground
    * truth; the DuckDB oracle recomputes the whole pipeline
    * independently, so the hash gate re-proves served == inline every
    * Verify run (the m7/g-family transitive check). */
  val s12IvfPqServed: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val idx = s12Index(s, dir)
    val codebooks = s.read.parquet(s"$idx/codebooks")
    val codes = s.read.parquet(s"$idx/codes") // vec_id, cids[4], cell
    val qsubs = pqSubs(kmVectors(s, dir)).filter(col("vec_id") % 50 === 0)
    val qcells = codes.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("cell").as("q_cell"))
    // per-query PACKED LUT: the 64 subspace distances ordered by
    // m*16+cid, one row per query — broadcast to the codes scan
    val luts = qsubs
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(codebooks), "m")
      .withColumn("qd2", expr(
        """aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)),
                     cast(0 as bigint), (a, x) -> a + x)"""))
      .groupBy("query_id")
      // the trained codebook is SPARSE (only cids some training vector
      // landed on exist), so the LUT is a map keyed by m*16+cid, not a
      // dense positional array — codes only ever reference trained cids
      .agg(expr(
        "map_from_entries(collect_list(struct(cast(m * 16 + cid as int) AS k, qd2)))")
        .as("lut"))
      .join(qcells, "query_id")
    // cell-keyed candidate scan: ADC distance reconstructed map-side
    // from the packed codes + LUT, and the per-query top-10 kept in a
    // bounded buffer (MinKDistAggregator) so the exchange carries
    // |q|·k pairs — never the Σ cell² candidate volume
    val minK = udaf(new graft.ops.MinKDistAggregator(10))
    val cand = codes.join(broadcast(luts), col("cell") === col("q_cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adist2", expr(
        """aggregate(sequence(0, 3), cast(0 as bigint),
             (a, m) -> a + element_at(lut,
               cast(m * 16 + element_at(cids, m + 1) as int)))"""))
      .groupBy("query_id", "q_cell")
      .agg(minK(col("vec_id"), col("adist2")).as("top"))
      .select(col("query_id"), col("q_cell").as("cell"),
        explode(col("top")).as("t"))
      .select(col("query_id"), col("cell"),
        col("t._2").as("vec_id"), col("t._1").as("adist2"))
    val qn = quantized(s, dir).select("vec_id", "qv", "n2")
    // cand is |q|·k rows BY CONSTRUCTION, but it flows out of a udaf
    // whose output has no size estimate — without a hint AQE
    // sometimes sort-merges these joins and shuffles the whole
    // quantized corpus (measured: the served probe read exp 1.49 from
    // exactly that flip; every stage is linear with the hint pinned).
    // |q| grows with the corpus (every 50th vector), so a FORCED
    // broadcast is linear-in-corpus driver/executor memory — a 100 TB
    // hazard. The hint is therefore bounded in BYTES, not rows (r10
    // advice: the broadcast frame that matters is withQ, which carries
    // the full quantized query vector per row — a row bound admits a
    // multi-GB payload): broadcast while |q|·k × the per-row width
    // (Dim int64 lanes + struct overhead) fits a driver comfortably,
    // shuffle_hash beyond — still sort-free and linear, with the build
    // side pinned on the bounded cand side. The row count comes from
    // the index's recorded _nrows sidecar, no per-call count() job.
    val candRows = indexRowCount(s, idx) / 50 * 10
    val withQRowBytes = 8L * Dim + 48
    val pin: DataFrame => DataFrame =
      if (candRows * withQRowBytes <= MaxPinnedBroadcastBytes) broadcast
      else df => df.hint("shuffle_hash")
    val withQ = pin(cand)
      .join(qn.select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2")), "query_id")
    pin(withQ).join(qn, "vec_id")
      .withColumn("cos_sim",
        cosine(graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")),
          col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("cell"), col("rank"),
        col("vec_id").as("neighbor_id"), col("adist2"), col("cos_sim"))
  }

  val s12IvfPqSql: String = s"""
    WITH $oracleQuantized,
    $pqSqlChain,
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    cells AS (
      SELECT vec_id, c_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, c_id) AS rn
        FROM scored_cells) WHERE rn = 1),
    codesc AS (SELECT c.vec_id, c.m, c.cid, s.cell
               FROM codes c JOIN cells s USING (vec_id)),
    lutc AS (SELECT l.query_id, l.m, l.cid, l.qd2, s.cell AS q_cell
             FROM lut l JOIN cells s ON l.query_id = s.vec_id),
    adc AS (
      SELECT query_id, cell, vec_id, CAST(SUM(qd2) AS BIGINT) AS adist2
      FROM codesc JOIN lutc USING (m, cid)
      WHERE cell = q_cell AND query_id <> vec_id
      GROUP BY 1, 2, 3),
    cand AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adist2, vec_id) AS crank
      FROM adc),
    exact AS (
      SELECT c.query_id, c.cell, c.vec_id, c.adist2,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qq.qv, i) * list_extract(nn.qv, i)), 'sum')::DOUBLE
               / sqrt(qq.n2::DOUBLE * nn.n2::DOUBLE) AS cos_sim
      FROM cand c
      JOIN qn qq ON c.query_id = qq.vec_id
      JOIN qn nn ON c.vec_id = nn.vec_id
      WHERE c.crank <= 10),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM exact)
    SELECT query_id, cell, rank, vec_id AS neighbor_id, adist2, cos_sim
    FROM ranked WHERE rank <= 5"""

  // =========================================================================
  // s13 — filtered (hybrid) ANN: metadata predicate inside the probe key
  // =========================================================================

  /** Same-class retrieval: each query's neighbors must share its
    * `label` — the "filtered vector search" problem every production
    * vector store faces (metadata predicate + similarity). The naive
    * composition POST-filters: scan the query's IVF cell, rank, then
    * drop wrong-label rows — recall and cost both degrade as the
    * filter gets selective. Here the predicate is PRE-filtering at the
    * plan level: `label` joins as part of the candidate key
    * (cell AND label), so wrong-label vectors never enter the scoring
    * join at all, and the cell partitioning composes with the filter
    * instead of fighting it. At 100 TB with storage partitioned by
    * (cell, label-family), the probe reads only matching partitions —
    * the same key-compound trick, pushed into layout.
    */
  val s13FilteredAnn: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val assigned = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("qv"), col("n2"),
        col("c_id").as("cell"))
      .registerCache()
    val qs = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("cell"), col("label"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    qs.join(assigned, Seq("cell", "label"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("label"), col("rank"),
        col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  val s13FilteredAnnSql: String = s"""
    WITH $oracleQuantized,
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, qn.label, qn.qv, qn.n2, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    assigned AS (
      SELECT vec_id, label, qv, n2, c_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, c_id) AS rn
        FROM scored_cells) WHERE rn = 1),
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, cell, label
                FROM assigned WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, q.label, a.vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(a.qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * a.n2::DOUBLE) AS cos_sim
      FROM queries q JOIN assigned a ON q.cell = a.cell AND q.label = a.label
      WHERE query_id <> a.vec_id),
    ranked AS (
      SELECT query_id, label, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, label, rank, vec_id AS neighbor_id, cos_sim
    FROM ranked WHERE rank <= 3"""

  /** s14 — kNN auto-labeling: predict each query vector's label by a
    * rank-weighted vote over its 5 nearest neighbors (weight 6−rank),
    * and report whether the vote agrees with the held-out true label.
    * The weak-supervision primitive a labeling pipeline runs to
    * propagate a small seed taxonomy onto an unlabeled corpus — and
    * the composition point for every ANN variant here: the candidate
    * stage below the vote is s1's exact scan in this declared
    * baseline, and swaps for s5/s12's IVF candidates at corpus scale
    * (same contract as s9's scan→re-rank split).
    *
    * Determinism: ranks are total-ordered (cos desc, neighbor id),
    * weights are small integers, and the argmax tie-breaks on
    * (vote_weight desc, label asc) — no float aggregation crosses a
    * reduce boundary. Scale shape: queries broadcast against the
    * corpus (the corpus never shuffles), the per-query top-5 rides
    * Spark's WindowGroupLimit rank pushdown, and the vote runs on the
    * ≤5·|queries| candidate grain.
    */
  val s14KnnClassify: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        col("qv").as("q_qv"), col("n2").as("q_n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    val voted = broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("q_n2"), col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(sum(lit(6) - col("rank")).cast("long").as("vote_weight"))
    voted
      .groupBy("query_id", "true_label")
      .agg(expr("max_by(named_struct('label', label, 'w', vote_weight)," +
        " named_struct('w', vote_weight, 'nl', -label))").as("win"))
      .select(col("query_id"),
        col("win.label").as("pred_label"),
        col("win.w").as("vote_weight"),
        col("true_label"),
        (col("win.label") === col("true_label")).cast("int").as("correct"))
  }

  val s14KnnClassifySql: String = s"""
    WITH $oracleQuantized,
    queries AS (SELECT vec_id AS query_id, label AS true_label,
                       qv AS q_qv, n2 AS q_n2
                FROM qn WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, true_label, vec_id, label,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE) AS cos_sim
      FROM queries JOIN qn ON query_id <> vec_id),
    ranked AS (
      SELECT query_id, true_label, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored),
    voted AS (
      SELECT query_id, true_label, label,
             CAST(SUM(6 - rank) AS BIGINT) AS vote_weight
      FROM ranked WHERE rank <= 5
      GROUP BY 1, 2, 3),
    win AS (
      SELECT query_id, true_label, label, vote_weight,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY vote_weight DESC, label) AS vr
      FROM voted)
    SELECT query_id, label AS pred_label, vote_weight, true_label,
           CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
    FROM win WHERE vr = 1"""

  /** s15 — MMR diversified re-rank (Carbonell & Goldstein 1998): from
    * each query's top-10 cosine candidates, greedily select 3 by
    * maximal marginal relevance — relevance minus redundancy against
    * what's already selected. The diversity stage of a retrieval /
    * training-batch-sampling pipeline: plain top-k returns near-
    * duplicates of one good hit; MMR's third pick is the best hit
    * that is NOT like the first two.
    *
    * Greedy is inherently sequential, but the horizon is THREE and
    * the candidate set is ten, so the steps unroll into one lazy plan
    * (g1's fixed-round discipline applied to selection): each step is
    * an anti-join (drop selected), a max-redundancy aggregate over
    * the selected set, and a rank-1 window — every frame bounded by
    * 10·|queries|. The DuckDB oracle is the SAME three unrolled
    * steps. Determinism: query and pair similarities quantize ONCE to
    * integer micros; the MMR objective compares the raw integer
    * `7·sim − 3·redundancy` (no division — cross-engine floor
    * semantics never enter), ties break on vec_id.
    */
  /** s15's top-10 candidate frame — package-visible so MmrRerankSpec
    * can pin the collapsed greedy aggregate against the unrolled
    * three-step join reference over the SAME candidates. */
  private[graft] def s15Cands(s: SparkSession, dir: String): DataFrame = {
    val corpus = quantized(s, dir)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("simq").desc, col("vec_id"))
    // top-10 candidates per query, query-sim quantized once to micros
    broadcast(queries)
      .join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("simq", expr(
        "cast(round(1e6 * (cast(long_array_dot(q_qv, qv) as double)" +
          " / sqrt(cast(q_n2 as double) * cast(n2 as double)))) as bigint)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id", "simq", "qv", "n2")
  }

  val s15MmrRerank: Q = (s, dir) =>
    // no cache: the collapsed plan reads the candidate frame exactly
    // once (the old unrolled form read it from the pair grid and all
    // three steps — that is what the registerCache existed for)
    s15MmrSelect(s15Cands(s, dir))

  /** The collapsed greedy-MMR selection over a candidate frame
    * (query_id, vec_id, simq, qv, n2) — package-visible so
    * MmrRerankSpec can drive it with degenerate (<3-candidate)
    * groups the production candidate generator never produces. */
  private[graft] def s15MmrSelect(cands: DataFrame): DataFrame = {
    // r14 optimization: the greedy horizon is 3 over a 10-candidate
    // set that is entirely QUERY-LOCAL, so the whole selection — the
    // pair-similarity grid, the three anti-join/redundancy/rank-1
    // steps (~8 shuffles, 29 joins, two window cascades in the old
    // plan) — collapses into ONE grouped collect + array expressions:
    // per query, sort the 10 candidates by the MMR objective, pick,
    // re-score the remainder against the growing selected set with
    // the same quantized pair similarity, pick twice more. One
    // hash(query_id) exchange (reusing the top-10 window's
    // partitioning), zero joins, and the 90-pair grid never exists as
    // a frame — each pair sim is computed at most twice inside the
    // expression. Frames stay bounded by construction (10 structs of
    // dim-8 vectors per group). The DuckDB oracle STAYS the unrolled
    // three-step join form, so the collapsed plan is re-proven
    // equivalent on every correctness run (measured: 1.28s → ~0.5s at
    // sf0.1, 29 → 3 jobs; integer micros make every comparison exact,
    // ties break on vec_id exactly as row_number did).
    def simp(a: String, b: String) =
      s"cast(round(1e6 * (cast(long_array_dot($a.qv, $b.qv) as double)" +
        s" / sqrt(cast($a.n2 as double) * cast($b.n2 as double)))) as bigint)"
    // MMR argmax order: score desc, vec_id asc — row_number's exact
    // tie-break in the unrolled form
    val byMmr = "(l, r) -> if(l.score > r.score, -1," +
      " if(l.score < r.score, 1, if(l.vec_id < r.vec_id, -1, 1)))"
    // get(), not [0]: ANSI mode (Spark 4 default) makes [0] THROW on
    // an empty array, so a query group that runs out of candidates
    // (rem2/rem3 empty) would crash the query instead of reaching the
    // null-filter below; get() returns NULL there, which is exactly
    // the "anti-join ran dry" degrade the unrolled form had
    def pickBest(from: String, score: String) =
      s"get(array_sort(transform($from, c -> struct(c.vec_id as vec_id," +
        s" $score as score, c.qv as qv, c.n2 as n2)), $byMmr), 0)"
    cands.groupBy("query_id")
      .agg(collect_list(struct(col("vec_id"), col("simq"), col("qv"),
        col("n2"))).as("cs"))
      .withColumn("sel1", expr(pickBest("cs", "c.simq * 7")))
      .withColumn("rem2", expr("filter(cs, c -> c.vec_id != sel1.vec_id)"))
      .withColumn("sel2", expr(pickBest("rem2",
        s"c.simq * 7 - 3 * ${simp("c", "sel1")}")))
      .withColumn("rem3", expr("filter(rem2, c -> c.vec_id != sel2.vec_id)"))
      .withColumn("sel3", expr(pickBest("rem3",
        s"c.simq * 7 - 3 * greatest(${simp("c", "sel1")}, ${simp("c", "sel2")})")))
      // a query with <3 candidates emits only the picks it has (the
      // unrolled form's anti-join simply ran dry) — filter the nulls
      .selectExpr("query_id",
        "explode(filter(array(" +
          "struct(sel1.vec_id as vec_id, 1 as mmr_rank, sel1.score as mmr_score)," +
          "struct(sel2.vec_id as vec_id, 2 as mmr_rank, sel2.score as mmr_score)," +
          "struct(sel3.vec_id as vec_id, 3 as mmr_rank, sel3.score as mmr_score))," +
          " x -> x.vec_id is not null)) as pick")
      .select(col("query_id"), col("pick.vec_id").as("vec_id"),
        col("pick.mmr_rank").as("mmr_rank"), col("pick.mmr_score").as("mmr_score"))
  }

  val s15MmrRerankSql: String = {
    def step(prev: String, k: Int) = s"""
    red$k AS (
      SELECT p.query_id, p.cand AS vec_id, max(p.simp) AS red
      FROM pairs p JOIN $prev s
        ON p.query_id = s.query_id AND p.other = s.vec_id
      GROUP BY 1, 2),
    pick$k AS (
      SELECT query_id, vec_id, $k AS mmr_rank, mmr_score FROM (
        SELECT c.query_id, c.vec_id, c.simq * 7 - r.red * 3 AS mmr_score,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY c.simq * 7 - r.red * 3 DESC, c.vec_id) AS rn
        FROM slim c
        JOIN red$k r ON c.query_id = r.query_id AND c.vec_id = r.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM $prev s
                          WHERE s.query_id = c.query_id
                            AND s.vec_id = c.vec_id)
      ) WHERE rn = 1),
    sel$k AS (SELECT query_id, vec_id, mmr_rank, mmr_score FROM $prev
              UNION ALL SELECT * FROM pick$k)"""
    s"""WITH $oracleQuantized,
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2 FROM qn
                WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, vec_id, qv, n2,
             CAST(round(1e6 * (list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE))) AS BIGINT) AS simq
      FROM queries JOIN qn ON query_id <> vec_id),
    cands AS (
      SELECT query_id, vec_id, simq, qv, n2 FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY simq DESC, vec_id) AS rk
        FROM scored) WHERE rk <= 10),
    slim AS (SELECT query_id, vec_id, simq FROM cands),
    pairs AS (
      SELECT a.query_id, a.vec_id AS cand, b.vec_id AS other,
             CAST(round(1e6 * (list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(a.qv, i) * list_extract(b.qv, i)), 'sum')::DOUBLE
               / sqrt(a.n2::DOUBLE * b.n2::DOUBLE))) AS BIGINT) AS simp
      FROM cands a JOIN cands b
        ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
    sel1 AS (
      SELECT query_id, vec_id, 1 AS mmr_rank, simq * 7 AS mmr_score FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY simq DESC, vec_id) AS rn
        FROM slim) WHERE rn = 1),
    ${step("sel1", 2)},
    ${step("sel2", 3)}
    SELECT query_id, vec_id, mmr_rank, CAST(mmr_score AS BIGINT) AS mmr_score
    FROM sel3"""
  }

  /** s16 — label-noise audit via neighborhood agreement (the
    * Confident-Learning-style data-quality pass for LABELED sets):
    * for every labeled vector, how many of its 5 nearest neighbors
    * inside its IVF cell carry the SAME label; low agreement marks a
    * suspect label. s14 propagates labels to the unlabeled — this
    * audits the labels you already paid for, the pass a training set
    * runs before anyone fine-tunes on it.
    *
    * Scale shape: s5's machinery unchanged (broadcast centroid
    * assignment, then ALL comparisons stay inside the cell equi-join
    * — bounded by cell size, the IVF knob, never corpus²); the top-5
    * rides the same windowed rank as s5, and agreement is one
    * map-combined count per vector.
    */
  val s16LabelAudit: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val assigned = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("qv"), col("n2"), col("c_id").as("cell"))
      .registerCache()
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id"))
    assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("label").as("a_label"), col("qv").as("a_qv"), col("n2").as("a_n2"))
      .join(assigned.select(col("cell"), col("vec_id").as("b_id"),
        col("label").as("b_label"), col("qv").as("b_qv"), col("n2").as("b_n2")),
        Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("a_qv"), col("b_qv")),
        col("a_n2"), col("b_n2")))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 5)
      .groupBy(col("a_id").as("vec_id"))
      .agg(sum(when(col("b_label") === col("a_label"), 1L).otherwise(0L)).as("agree5"),
        count(lit(1)).as("n_neighbors"))
      // Drive from the full audited corpus: a vector alone in its IVF
      // cell has NO same-cell neighbors — precisely the isolated-in-
      // embedding-space row the audit must surface, as n_neighbors=0 /
      // agree5=0 / suspect=true, not silently omit.
      .join(assigned.select("vec_id", "label"), Seq("vec_id"), "right")
      .select(col("vec_id"), col("label"),
        coalesce(col("agree5"), lit(0L)).as("agree5"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
      .withColumn("suspect", col("agree5") <= 1)
  }

  val s16LabelAuditSql: String = s"""
    WITH $oracleQuantized,
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, qn.label, qn.qv, qn.n2, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    assigned AS (
      SELECT vec_id, label, qv, n2, c_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, c_id) AS rn
        FROM scored_cells) WHERE rn = 1),
    scored AS (
      SELECT a.vec_id AS a_id, a.label AS a_label,
             b.vec_id AS b_id, b.label AS b_label,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(a.qv, i) * list_extract(b.qv, i)), 'sum')::DOUBLE
               / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cos_sim
      FROM assigned a JOIN assigned b USING (cell)
      WHERE a.vec_id <> b.vec_id),
    top5 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY a_id
                                     ORDER BY cos_sim DESC, b_id) AS rk
        FROM scored) WHERE rk <= 5)
    , agg AS (
      SELECT a_id AS vec_id,
             CAST(SUM(CASE WHEN b_label = a_label THEN 1 ELSE 0 END) AS BIGINT) AS agree5,
             count(*) AS n_neighbors
      FROM top5 GROUP BY a_id)
    SELECT assigned.vec_id, assigned.label,
           coalesce(agree5, 0) AS agree5,
           coalesce(n_neighbors, 0) AS n_neighbors,
           coalesce(agree5, 0) <= 1 AS suspect
    FROM assigned LEFT JOIN agg ON assigned.vec_id = agg.vec_id"""

  // =========================================================================
  // s17 — recall@k curve of the IVF index vs the exact baseline
  // =========================================================================

  /** Recall curve for s5's IVF index: recall@k for k ∈ {1,3,5,10}
    * against the exact brute-force baseline, averaged over all
    * queries, in basis points — the operating-curve readout an index
    * rollout decision needs (s8 measures ONE point of the bucketed
    * index; this sweeps the depth axis of the production IVF). A
    * recall@1 ≫ recall@10 gap means the cell prune is fine for
    * serving top-1 but starves deep result pages — the signal that
    * moves the nprobe knob (s6).
    *
    * Determinism: both rankings use the exact int64 dot + one
    * correctly-rounded division (s1's discipline) with vec_id
    * tie-breaks; the curve is exact integer counting over the two
    * rank sets (a pair contributes to k iff max(rank_e, rank_a) ≤ k).
    *
    * Scale shape: the exact side is s1's declared brute-force
    * baseline (the curve's denominator NEEDS ground truth — at
    * production scale this runs on a held-out query sample, not the
    * corpus); the IVF side is s5's cell-bounded join. The join of
    * the two rank lists is ≤10 rows per query on each side; the
    * whole curve collapses to ONE row of conditional counts then a
    * 4-row unpivot (Expand, zero shuffle). n_queries is a one-row
    * broadcast scalar.
    */
  val s17RecallCurve: Q = (s, dir) => {
    val corpus = quantized(s, dir)
    val queries = corpus.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    val exact = broadcast(queries).join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank_e", row_number().over(wq))
      .filter(col("rank_e") <= 10)
      .select(col("query_id"), col("vec_id"), col("rank_e"))
    val centroids = corpus.filter(col("vec_id") % 125 === 0)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"), col("n2").as("c_n2"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    val assigned = corpus.join(broadcast(centroids))
      .withColumn("c_cos", cosine(
        graft.plans.LongArrayDot.dot(col("qv"), col("c_qv")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("n2"), col("c_id").as("cell"))
      .registerCache()
    val aq = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"), col("cell"))
    val approx = aq.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", cosine(
        graft.plans.LongArrayDot.dot(col("q_qv"), col("qv")), col("q_n2"), col("n2")))
      .withColumn("rank_a", row_number().over(wq))
      .filter(col("rank_a") <= 10)
      .select(col("query_id"), col("vec_id"), col("rank_a"))
    val joined = exact.join(approx, Seq("query_id", "vec_id"))
      .select(greatest(col("rank_e"), col("rank_a")).as("mr"))
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    joined.agg(
        count(when(col("mr") <= 1, 1)).as("k1"),
        count(when(col("mr") <= 3, 1)).as("k3"),
        count(when(col("mr") <= 5, 1)).as("k5"),
        count(when(col("mr") <= 10, 1)).as("k10"))
      .crossJoin(broadcast(nq))
      .unpivot(Array(col("n_queries")),
        Array(col("k1"), col("k3"), col("k5"), col("k10")), "kname", "hits")
      .select(expr("cast(substr(kname, 2) as bigint)").as("k"),
        col("hits"), col("n_queries"),
        expr("hits * 10000 div (k * n_queries)").as("recall_bp"))
  }

  val s17RecallCurveSql: String = s"""
    WITH $oracleQuantized,
    queries AS (SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2 FROM qn
                WHERE vec_id % 50 = 0),
    scored AS (
      SELECT query_id, vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(q_qv, i) * list_extract(qv, i)), 'sum')::DOUBLE
               / sqrt(q_n2::DOUBLE * n2::DOUBLE) AS cos_sim
      FROM queries JOIN qn ON query_id <> vec_id),
    exact AS (
      SELECT query_id, vec_id, rn AS rank_e FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored) WHERE rn <= 10),
    centroids AS (SELECT vec_id AS c_id, qv AS c_qv, n2 AS c_n2 FROM qn
                  WHERE vec_id % 125 = 0),
    scored_cells AS (
      SELECT qn.vec_id, qn.qv, qn.n2, c_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(qv, i) * list_extract(c_qv, i)), 'sum')::DOUBLE
               / sqrt(n2::DOUBLE * c_n2::DOUBLE) AS c_cos
      FROM qn CROSS JOIN centroids),
    assigned AS (
      SELECT vec_id, qv, n2, c_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, c_id) AS rn
        FROM scored_cells) WHERE rn = 1),
    ascored AS (
      SELECT a.vec_id AS query_id, b.vec_id,
             list_aggregate(list_transform(range(1, $Dim + 1),
               i -> list_extract(a.qv, i) * list_extract(b.qv, i)), 'sum')::DOUBLE
               / sqrt(a.n2::DOUBLE * b.n2::DOUBLE) AS cos_sim
      FROM assigned a JOIN assigned b USING (cell)
      WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id),
    approx AS (
      SELECT query_id, vec_id, rn AS rank_a FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM ascored) WHERE rn <= 10),
    j AS (
      SELECT greatest(rank_e, rank_a) AS mr
      FROM exact e JOIN approx a USING (query_id, vec_id)),
    nq AS (SELECT count(*) AS n_queries FROM queries),
    h AS (
      SELECT count(CASE WHEN mr <= 1 THEN 1 END) AS k1,
             count(CASE WHEN mr <= 3 THEN 1 END) AS k3,
             count(CASE WHEN mr <= 5 THEN 1 END) AS k5,
             count(CASE WHEN mr <= 10 THEN 1 END) AS k10
      FROM j),
    u AS (
      SELECT 1 AS k, k1 AS hits FROM h
      UNION ALL SELECT 3, k3 FROM h
      UNION ALL SELECT 5, k5 FROM h
      UNION ALL SELECT 10, k10 FROM h)
    SELECT CAST(k AS BIGINT) AS k, CAST(hits AS BIGINT) AS hits,
           n_queries, hits * 10000 // (k * n_queries) AS recall_bp
    FROM u CROSS JOIN nq"""

  val queries: Map[String, Q] = Map(
    "s17_recall_curve"     -> s17RecallCurve,
    "s16_label_audit"      -> s16LabelAudit,
    "s15_mmr_rerank"       -> s15MmrRerank,
    "s14_knn_classify"     -> s14KnnClassify,
    "s13_filtered_ann"     -> s13FilteredAnn,
    "s12_ivf_pq"           -> s12IvfPqServed,
    "s10_pq_adc"           -> s10PqAdc,
    "s11_kmeans"           -> s11Kmeans,
    "d19_semdedup"         -> d19Semdedup,
    "s9_sq_ann"            -> s9SqAnn,
    "s8_ann_recall"        -> s8AnnRecall,
    "s6_multiprobe_ann"    -> s6MultiprobeAnn,
    "s7_vector_stats"      -> s7VectorStats,
    "s1_cosine_topk"       -> s1CosineTopk,
    "s2_lsh_buckets"       -> s2LshBuckets,
    "s3_ann_bucketed"      -> s3AnnBucketed,
    "s4_embedding_neardup" -> s4EmbeddingNeardup,
    "s5_ivf_ann"           -> s5IvfAnn,
  )

  val oracleSql: Map[String, String] = Map(
    "s17_recall_curve"     -> s17RecallCurveSql,
    "s16_label_audit"      -> s16LabelAuditSql,
    "s15_mmr_rerank"       -> s15MmrRerankSql,
    "s14_knn_classify"     -> s14KnnClassifySql,
    "s13_filtered_ann"     -> s13FilteredAnnSql,
    "s12_ivf_pq"           -> s12IvfPqSql,
    "s10_pq_adc"           -> s10PqAdcSql,
    "s11_kmeans"           -> s11KmeansSql,
    "d19_semdedup"         -> d19SemdedupSql,
    "s9_sq_ann"            -> s9SqAnnSql,
    "s8_ann_recall"        -> s8AnnRecallSql,
    "s1_cosine_topk"       -> s1CosineTopkSql,
    "s2_lsh_buckets"       -> s2LshBucketsSql,
    "s3_ann_bucketed"      -> s3AnnBucketedSql,
    "s4_embedding_neardup" -> s4EmbeddingNeardupSql,
    "s5_ivf_ann"           -> s5IvfAnnSql,
    "s6_multiprobe_ann"    -> s6MultiprobeAnnSql,
    "s7_vector_stats"      -> s7VectorStatsSql,
  )
}
