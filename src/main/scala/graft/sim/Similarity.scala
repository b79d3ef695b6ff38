package graft.sim

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "embeddings")
      .withColumn("qv",
        expr(s"transform(embedding, x -> cast(round(cast(x as double) * $Scale) as bigint))"))
      .withColumn("n2", graft.plans.LongArrayDot.dot(col("qv"), col("qv")))

  private val oracleQuantized: String = s"""
    q AS (SELECT vec_id, label,
            list_transform(embedding, x -> CAST(round(x::DOUBLE * $Scale) AS BIGINT)) AS qv
          FROM embeddings),
    qn AS (SELECT vec_id, label, qv,
             list_aggregate(list_transform(qv, x -> x*x), 'sum') AS n2
           FROM q)"""

  private def cosine(dot: Column, na: Column, nb: Column): Column =
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
  val s4EmbeddingNeardup: Q = (s, dir) => {
    val e = quantized(s, dir)
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", graft.plans.LongArrayDot.dot(col("a.qv"), col("b.qv")))
      .withColumn("cos_sim", cosine(col("dot"), col("a.n2"), col("b.n2")))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos_sim"))
  }

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

  val queries: Map[String, Q] = Map(
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
