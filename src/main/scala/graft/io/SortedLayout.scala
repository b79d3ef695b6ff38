package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Layout-aware writer: range-partition + sort-within-partition before
  * writing parquet.
  *
  * The reference's backups land unordered (`BkupRs.py:272-280` appends
  * whatever partitioning the scan produced). At 100 TB the layout IS
  * the index: writing each file as a disjoint sorted key range means
  * (a) parquet row-group min/max stats become selective — a point or
  * range predicate on the layout key prunes whole files/row groups at
  * plan time, and (b) downstream merge-style reads see locality
  * (near-dup fingerprints, time windows, user sessions cluster into
  * the same files).
  *
  * `repartitionByRange` samples the key distribution (reservoir per
  * partition) so skewed keys still yield balanced files — the same
  * mechanism Spark uses for global `orderBy`, minus the final merge.
  */
object SortedLayout {

  /** Write `df` as `numFiles` parquet files with globally disjoint,
    * internally sorted ranges of `keys`.
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       keys: Column*): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Per-file (min, max) of `key` for a directory written by
    * [[writeRangeSorted]] — the audit surface: ranges must not overlap.
    */
  def fileRanges(df: DataFrame, key: String): Array[(String, Any, Any)] = {
    import org.apache.spark.sql.Row
    df.select(input_file_name().as("f"), col(key))
      .groupBy("f").agg(min(key).as("lo"), max(key).as("hi"))
      .orderBy("lo")
      .collect()
      .map { case Row(f: String, lo, hi) => (f, lo, hi) }
  }
}
