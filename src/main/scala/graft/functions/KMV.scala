package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Caching.RegisterSyntax
import graft.core.Tables

/** KMV (k-minimum-values) distinct-count sketch — the sketch family
  * the engine exposes for approximate analytics at scale. Unlike
  * HLL++, KMV over a deterministic hash is **reproducible across
  * engines**: both sides hash with md5, keep the k smallest values,
  * and the estimator `(k-1) · 2^60 / h_(k)` is one exact integer
  * division chain — so the "approximate" query still passes the
  * bit-exact oracle gate.
  *
  * The k minima flow through [[KMinAgg]], a typed `Aggregator` whose
  * buffer is a ≤k-element sorted set: each partition ships only k
  * values, merged heap-wise at the reducer — O(n log k), no global
  * sort, and no single-reducer skew when one group dominates (the
  * windowed `row_number` alternative sorts a whole language's
  * vocabulary on one task). Standalone sketch use needs NO distinct
  * shuffle at all — the buffer dedups — q22 only pre-distincts
  * because its exact-count comparison column needs it anyway.
  */
object KMV {

  private val K = 64
  private val HashSpace = 1L << 60 // md5's first 15 hex digits

  /** k smallest **distinct** Long values per group; ascending output.
    * The mergeable-sketch shape: buffer size is bounded by k on the
    * wire regardless of input size.
    */
  class KMinAgg(k: Int)
    extends Aggregator[Long, mutable.TreeSet[Long], Seq[Long]] with Serializable {
    override def zero: mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]
    override def reduce(b: mutable.TreeSet[Long], h: Long): mutable.TreeSet[Long] = {
      if (b.size < k) b += h
      else if (h < b.last) { b += h; if (b.size > k) b -= b.last }
      b
    }
    override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
      b.foreach(h => reduce(a, h))
      a
    }
    override def finish(b: mutable.TreeSet[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[mutable.TreeSet[Long]] =
      Encoders.javaSerialization[mutable.TreeSet[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** q22 — per-language estimated vs exact distinct token count. */
  val q22KmvDistinct: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    val toks = Tables.loadParallel(s, dir, "documents")
      .select(col("lang"),
        explode(expr("split(lower(trim(text)), ' +')")).as("tok"))
      .distinct()
      .withColumn("h", expr("cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint)"))
    val kth = toks.select(col("lang"), col("h")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KMinAgg(K).toColumn.name("mins"))
      .toDF("lang", "mins")
      .select(col("lang"), expr(s"try_element_at(mins, $K)").as("hk"))
    val exact = toks.groupBy("lang").agg(count(lit(1)).as("exact_distinct"))
    exact.join(kth, Seq("lang"), "left")
      .select(col("lang"), col("exact_distinct"),
        when(col("hk").isNull, col("exact_distinct").cast("double"))
          .otherwise(lit((K - 1).toDouble * HashSpace) / col("hk"))
          .as("kmv_estimate"))
  }

  val q22KmvDistinctSql: String = s"""
    WITH toks AS (
      SELECT DISTINCT lang,
             unnest(str_split_regex(lower(trim(text)), ' +')) AS tok
      FROM documents),
    h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
    kth AS (SELECT lang, h AS hk FROM (
              SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
              FROM h) WHERE rn = $K),
    exact AS (SELECT lang, count(*) AS exact_distinct FROM h GROUP BY lang)
    SELECT exact.lang, exact_distinct,
           CASE WHEN hk IS NULL THEN exact_distinct::DOUBLE
                ELSE ${(K - 1).toDouble} * $HashSpace / hk END AS kmv_estimate
    FROM exact LEFT JOIN kth ON exact.lang = kth.lang"""

  /** q98 — KMV SET OPERATIONS (Beyer et al., SIGMOD 2007): estimate
    * the distinct-user union and intersection of two event audiences
    * ("view" vs "purchase") from their two k-min sketches ALONE — the
    * theta-sketch use case: audience overlap across datasets that are
    * never co-located, answered by shipping two k-value sketches
    * instead of re-shuffling either table.
    *
    * Union: merge the two minima lists, keep the k smallest — a valid
    * KMV sketch of A∪B by construction → U = (k−1)·H / h_(k).
    * Intersection: among those combined k minima, the fraction ρ
    * present in BOTH input sketches is an unbiased Jaccard estimate →
    * I = ρ·U (one multiply; kept as `both·U/k` in doubles computed
    * identically on both engines — q22's discipline).
    *
    * Scale shape: per-side the same bounded KMinAgg as q22 (k values
    * per partition on the wire); the set algebra then runs on TWO
    * k-element arrays in a one-row frame — array_sort/slice/filter
    * HOFs, zero further shuffle. Exact union/intersection ride the
    * same distinct pass as ground truth (s8/d18 honesty). If the
    * merged sketch has < k values the estimate IS the exact count
    * (sketch saw everything) — both engines take the same branch.
    */
  val q98KmvSetops: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    val ev = Tables.loadParallel(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", expr("cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)"))
      .registerCache()
    val sketches = ev.select(col("event_type"), col("h")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KMinAgg(K).toColumn.name("mins"))
      .toDF("event_type", "mins")
      // collapse to ONE row so a missing audience shows up as an empty
      // sketch instead of silently zeroing the whole report (the c17
      // empty-group lesson): a global aggregate always emits its row
      .agg(
        coalesce(max(when(col("event_type") === "view", col("mins"))),
          expr("array()")).as("ma"),
        coalesce(max(when(col("event_type") === "purchase", col("mins"))),
          expr("array()")).as("mb"))
    val exact = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_types"))
      .agg(count(lit(1)).as("exact_union"),
        coalesce(sum(when(col("n_types") === 2, 1L).otherwise(0L)), lit(0L))
          .as("exact_intersect"))
    sketches.crossJoin(broadcast(exact))
      .withColumn("merged", expr(s"slice(array_sort(array_union(ma, mb)), 1, $K)"))
      .withColumn("m", size(col("merged")))
      .withColumn("both",
        expr("size(filter(merged, x -> array_contains(ma, x) AND array_contains(mb, x)))"))
      .withColumn("union_est",
        when(col("m") < K, col("m").cast("double"))
          .otherwise(lit((K - 1).toDouble * HashSpace) / expr(s"element_at(merged, $K)")))
      // m=0 (BOTH audiences absent) must read 0.0, not 0/0: Spark's
      // double division gives NaN where DuckDB gives NULL — the one
      // degenerate board the empty-sketch coalesce above doesn't cover
      .withColumn("intersect_est",
        when(col("m") === 0, lit(0.0))
          .otherwise(col("both") * col("union_est") / col("m")))
      .select(col("exact_union"), col("exact_intersect"),
        col("union_est"), col("intersect_est"))
  }

  val q98KmvSetopsSql: String = s"""
    WITH ev AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('view', 'purchase')),
    h AS (SELECT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM ev),
    mins AS (SELECT event_type, list(h ORDER BY h) AS mins FROM (
               SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
               FROM h) WHERE rn <= $K GROUP BY event_type),
    ab AS (SELECT coalesce(max(CASE WHEN event_type = 'view' THEN mins END), []) AS ma,
                  coalesce(max(CASE WHEN event_type = 'purchase' THEN mins END), []) AS mb
           FROM mins),
    exact AS (SELECT count(*) AS exact_union,
                     coalesce(CAST(SUM(CASE WHEN n_types = 2 THEN 1 ELSE 0 END) AS BIGINT), 0) AS exact_intersect
              FROM (SELECT user_id, count(*) AS n_types FROM ev GROUP BY user_id)),
    alg AS (SELECT ma, mb,
                   list_slice(list_sort(list_distinct(list_concat(ma, mb))), 1, $K) AS merged
            FROM ab),
    st AS (SELECT ma, mb, merged, len(merged) AS m,
                  len(list_filter(merged, x -> list_contains(ma, x) AND list_contains(mb, x))) AS n_both
           FROM alg)
    SELECT exact_union, exact_intersect,
           CASE WHEN m < $K THEN m::DOUBLE
                ELSE ${(K - 1).toDouble} * $HashSpace / merged[$K] END AS union_est,
           CASE WHEN m = 0 THEN 0.0
                ELSE n_both * (CASE WHEN m < $K THEN m::DOUBLE
                        ELSE ${(K - 1).toDouble} * $HashSpace / merged[$K] END) / m END
             AS intersect_est
    FROM st CROSS JOIN exact"""

  val queries = Map(
    "q22_kmv_distinct" -> q22KmvDistinct,
    "q98_kmv_setops"   -> q98KmvSetops)
  val oracleSql = Map(
    "q22_kmv_distinct" -> q22KmvDistinctSql,
    "q98_kmv_setops"   -> q98KmvSetopsSql)
}
