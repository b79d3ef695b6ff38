package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

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

  val queries = Map("q22_kmv_distinct" -> q22KmvDistinct)
  val oracleSql = Map("q22_kmv_distinct" -> q22KmvDistinctSql)
}
