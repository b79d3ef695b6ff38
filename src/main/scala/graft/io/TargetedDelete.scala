package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surgical row deletion from a parquet table — the takedown/GDPR
  * primitive a corpus store needs that the reference's
  * delete-then-append sink (K1) can only do as a FULL table rewrite.
  *
  * Delete cost here is proportional to the files that actually
  * contain target rows, not to the table: a pushdown-filtered scan
  * (parquet min/max stats prune non-overlapping files — which is why
  * this composes with `SortedLayout.writeRangeSorted`: ids cluster
  * into few files) identifies the affected files via
  * `input_file_name()`, ONLY those files are rewritten minus the
  * targets, and untouched files are left byte-identical on disk. At
  * 100 TB with a sorted layout, deleting a handful of documents
  * rewrites a handful of files.
  *
  * Visibility: the swap is delete-old-then-keep-new within the live
  * directory — a concurrent reader can see a partial view during the
  * swap window. For serving tables, compose with
  * [[AtomicPublish.publishVersioned]] instead (write the post-delete
  * table as version n+1); this in-place flavor is for the
  * pipeline-internal stores where the writer owns the directory.
  */
object TargetedDelete {

  case class Report(rowsDeleted: Long, filesRewritten: Long, filesTotal: Long)

  /** Delete rows whose `idCol` is in `ids` from the parquet table at
    * `table`. Returns per-file accounting. */
  def deleteIds(spark: SparkSession, table: String, idCol: String,
                ids: Seq[Long]): Report = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = spark.read.parquet(table)
    val filesTotal = all.select(input_file_name()).distinct().count()

    // pushdown-filtered scan: parquet stats prune files whose
    // [min,max] can't contain a target id, so this touches only
    // candidate files even before the filter evaluates
    val affectedFiles = all
      .filter(col(idCol).isin(ids: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))

    if (affectedFiles.isEmpty) return Report(0L, 0L, filesTotal)

    val affected = spark.read.parquet(affectedFiles: _*)
    val rowsDeleted = affected.filter(col(idCol).isin(ids: _*)).count()
    val kept = affected.filter(!col(idCol).isin(ids: _*))

    // rewrite survivors of the affected files into a staging dir, then
    // swap move-in-BEFORE-delete: if we crash after the renames but
    // before the deletes, readers see survivor rows twice (and a re-run
    // of the same delete converges — survivors carry no target ids);
    // the opposite order would make a crash between delete and rename
    // silently LOSE the survivor rows, which is unrecoverable
    val staging = new Path(table + ".delete-staging")
    fs.delete(staging, true)
    kept.write.mode("overwrite").parquet(staging.toString)
    val staged = fs.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
    staged.zipWithIndex.foreach { case (st, i) =>
      val dest = new Path(table, f"deleted-rewrite-${System.currentTimeMillis()}%d-$i%04d.parquet")
      require(fs.rename(st.getPath, dest), s"rename ${st.getPath} -> $dest failed")
    }
    affectedFiles.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))
    fs.delete(staging, true)
    Report(rowsDeleted, affectedFiles.length.toLong, filesTotal)
  }
}
