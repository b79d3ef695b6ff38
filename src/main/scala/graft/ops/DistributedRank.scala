package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / ntile — the scale-safe replacement for
  * `ntile(n).over(Window.orderBy(...))`, whose partition-less window
  * plans as an `Exchange SinglePartition` + one-task sort of the
  * whole input (the q80/q72 shape the round-4 audit flagged).
  *
  * Algorithm (one full shuffle, everything else bounded by the
  * shuffle-partition count):
  *
  *  1. `repartitionByRange(sortCols)` — the only data-sized exchange;
  *     range partitions are globally ordered by construction.
  *  2. `sortWithinPartitions(sortCols)` + `monotonically_increasing_id()`
  *     — the id packs `partition << 33 | row-in-partition`, so the
  *     local rank and the partition index come out of ONE narrow
  *     projection with no second shuffle and no window over data.
  *  3. Per-partition row counts, aggregated from the SAME range
  *     exchange (Catalyst's ReuseExchange materializes it once, so
  *     both branches see identical partition boundaries — load-bearing,
  *     pinned by `DistributedRankSpec`), cumulative-summed into start
  *     offsets over a frame of ≤ `spark.sql.shuffle.partitions` rows.
  *     That tiny cumsum is the one remaining SinglePartition window;
  *     it is bounded by the partition count, not the data, and
  *     `PlanCheck` exempts it by its `SPARK_PARTITION_ID` grouping.
  *  4. Broadcast-join offsets back on partition index:
  *     `global_rank = offset + local_rank`.
  *
  * `sortCols` must be a TOTAL order (tie-break on a unique key) —
  * same contract ntile-with-tie-break had; with a total order the
  * result is independent of where the range boundaries fall, so the
  * sampling inside `RangePartitioner` cannot perturb it.
  */
object DistributedRank {

  /** monotonically_increasing_id layout: partition in the upper bits,
    * row-within-partition in the lower 33. */
  private val RowBits = 33
  private val RowMask = (1L << RowBits) - 1

  private val Mid  = "__dr_mid"
  private val Pid  = "__dr_pid"
  private val Lrn  = "__dr_lrn"
  private val Cnt  = "__dr_cnt"
  private val Off  = "__dr_off"

  /** Adds `rankCol` (1-based dense global position under `sortCols`)
    * and `totalCol` (total row count) to `df`. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String, totalCol: String): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
    val local = ranged
      .sortWithinPartitions(sortCols: _*)
      .withColumn(Mid, monotonically_increasing_id())
      .withColumn(Pid, shiftright(col(Mid), RowBits).cast("int"))
      .withColumn(Lrn, col(Mid).bitwiseAND(lit(RowMask)) + lit(1L))
      .drop(Mid)
    // Counts come straight off the exchange output (no sort needed):
    // spark_partition_id is nondeterministic so it must be projected
    // before the groupBy. Empty partitions simply don't appear —
    // they contribute 0 to every offset.
    val counts = ranged
      .select(spark_partition_id().as(Pid))
      .groupBy(Pid)
      .agg(count(lit(1)).as(Cnt))
    val wPid = Window.orderBy(Pid)
    val offsets = counts
      .withColumn(Off, coalesce(
        sum(Cnt).over(wPid.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(totalCol, sum(Cnt).over(
        wPid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(Pid), col(Off), col(totalCol))
    local
      .join(broadcast(offsets), Seq(Pid))
      .withColumn(rankCol, col(Off) + col(Lrn))
      .drop(Pid, Lrn, Off)
  }

  /** Adds `out` = the exact `ntile(n) OVER (ORDER BY sortCols)` bucket
    * (IntegerType, like ntile), computed arithmetically from the
    * distributed global rank: with c rows the first c%n buckets get
    * ⌈c/n⌉ rows and the rest ⌊c/n⌋ — the SQL-standard remainder
    * distribution both Spark and DuckDB implement. All arithmetic is
    * exact integer DIV/%; the ELSE branch's divisor ⌊c/n⌋ can be 0
    * only when c<n, in which case every rank satisfies the WHEN
    * branch and CASE's lazy evaluation never divides.
    */
  def withNtile(df: DataFrame, n: Int, sortCols: Seq[Column],
                out: String): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val rank = "__dr_rank"; val tot = "__dr_tot"
    withGlobalRank(df, sortCols, rank, tot)
      .withColumn(out, expr(
        s"""CASE WHEN $rank <= ($tot % $n) * ($tot DIV $n + 1)
           |     THEN CAST(($rank - 1) DIV ($tot DIV $n + 1) + 1 AS INT)
           |     ELSE CAST(($tot % $n) +
           |               ($rank - 1 - ($tot % $n) * ($tot DIV $n + 1))
           |                 DIV ($tot DIV $n) + 1 AS INT)
           |END""".stripMargin))
      .drop(rank, tot)
  }
}
