package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** KMV (k-minimum-values) distinct-count sketch — the sketch family
  * the engine exposes for approximate analytics at scale. Unlike
  * HLL++, KMV over a deterministic hash is **reproducible across
  * engines**: both sides hash with md5, keep the k smallest values,
  * and the estimator `(k-1) · 2^60 / h_(k)` is one exact integer
  * division chain — so the "approximate" query still passes the
  * bit-exact oracle gate. At 100 TB the sketch is mergeable: per
  * partition keep k minima, union + re-take k at the reducer (here the
  * window form expresses the same thing declaratively).
  */
object KMV {

  private val K = 64
  private val HashSpace = 1L << 60 // md5's first 15 hex digits

  /** q22 — per-language estimated vs exact distinct token count. */
  val q22KmvDistinct: (SparkSession, String) => DataFrame = (s, dir) => {
    val toks = Tables.loadParallel(s, dir, "documents")
      .select(col("lang"),
        explode(expr("split(lower(trim(text)), ' +')")).as("tok"))
      .distinct()
      .withColumn("h", expr("cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint)"))
    val w = Window.partitionBy("lang").orderBy("h")
    val kth = toks.withColumn("rn", row_number().over(w))
      .filter(col("rn") === K)
      .select(col("lang"), col("h").as("hk"))
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
