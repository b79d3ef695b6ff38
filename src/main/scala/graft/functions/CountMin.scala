package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Count-min sketch heavy hitters — the frequency-estimation sketch
  * next to [[KMV]] (distinct count) and the HLL++/quantile built-ins.
  *
  * Shape at 100 TB: the sketch is a `depth × width` counter grid built
  * in ONE shuffle (explode depth rows per record → groupBy (row,
  * bucket) → count) whose size is O(depth·width) — constant, tiny,
  * broadcastable — regardless of input size or key cardinality. The
  * estimate for a key is min over rows of its bucket counter
  * (overestimates only, never under). The heavy-hitter query then
  * joins candidate keys against the broadcast grid instead of
  * computing exact per-key counts — the point of the sketch when the
  * key space is too large to group exactly.
  *
  * Hashing is md5-based (row-salted) so the DuckDB oracle reproduces
  * the grid bit-for-bit, like every sketch in this engine — even the
  * *approximate* answers are deterministic and cross-engine exact.
  */
object CountMin {

  private val Depth = 3
  private val Width = 64
  private val Threshold = 40 // estimated-count cutoff for "heavy"

  /** bucket expression for hash row `i` over string column `k` (Spark). */
  private def bucket(i: Int, k: String): String =
    s"cast(conv(substr(md5(concat('$i:', $k)), 1, 8), 16, 10) as bigint) % $Width"

  private def oracleBucket(i: Int, k: String): String =
    s"('0x' || substr(md5('$i:' || $k), 1, 8))::BIGINT % $Width"

  /** The sketch grid for a key expression: (row, bucket, cnt). */
  def sketch(df: DataFrame, keyExpr: String): DataFrame = {
    val rows = (0 until Depth).map { i =>
      s"struct($i as row, ${bucket(i, keyExpr)} as bucket)"
    }.mkString(", ")
    df.select(explode(expr(s"array($rows)")).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** q29 — heavy users by count-min estimate: every distinct user
    * joined against the broadcast grid, estimate = min over rows,
    * kept when >= [[Threshold]]. Exact count included for the oracle
    * to prove the over-estimate invariant holds on both engines.
    */
  val q29CountminHeavy: (SparkSession, String) => DataFrame = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select(expr("cast(user_id as string)").as("k"))
    val grid = sketch(ev, "k")
    val keys = ev.distinct()
    val probes = (0 until Depth).map { i =>
      keys.select(col("k"), lit(i).as("row"), expr(bucket(i, "k")).as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(grid), Seq("row", "bucket"))
      .groupBy("k")
      .agg(min("cnt").as("est"))
      .filter(col("est") >= Threshold)
      .select(expr("cast(k as bigint)").as("user_id"), col("est"))
  }

  val q29CountminHeavySql: String = {
    val grids = (0 until Depth).map { i =>
      s"SELECT $i AS row, ${oracleBucket(i, "k")} AS bucket, count(*) AS cnt FROM ev GROUP BY 1, 2"
    }.mkString("\n      UNION ALL ")
    val probes = (0 until Depth).map { i =>
      s"SELECT k, $i AS row, ${oracleBucket(i, "k")} AS bucket FROM (SELECT DISTINCT k FROM ev)"
    }.mkString("\n      UNION ALL ")
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    grid AS (
      $grids),
    probes AS (
      $probes)
    SELECT CAST(k AS BIGINT) AS user_id, min(cnt) AS est
    FROM probes JOIN grid USING (row, bucket)
    GROUP BY 1 HAVING min(cnt) >= $Threshold"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q29_countmin_heavy" -> q29CountminHeavy)
  val oracleSql: Map[String, String] =
    Map("q29_countmin_heavy" -> q29CountminHeavySql)
}
