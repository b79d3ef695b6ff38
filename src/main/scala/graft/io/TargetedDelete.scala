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

  private def journalPath(table: String) = new Path(table + ".delete-journal")

  /** Crash recovery for the swap. The journal is written AFTER staging
    * completes and BEFORE any table mutation; it records the full swap
    * plan (`mv` staged→dest renames, `old` files to delete) and ends
    * with an `END` marker. On entry:
    *  - no journal → no crash, nothing to do;
    *  - journal without `END` → died writing the journal itself, so
    *    the table was never touched: discard journal + staging;
    *  - complete journal → REPLAY it: finish any missing renames
    *    (both sides idempotent — a rename already done leaves no src),
    *    delete the old files, drop staging and the journal.
    * Without this, a re-run after a mid-swap crash would re-rewrite
    * survivors from still-present old files while staged-in copies
    * remain — duplicating every survivor permanently.
    */
  private def recoverIfCrashed(fs: org.apache.hadoop.fs.FileSystem,
                               table: String): Unit = {
    val j = journalPath(table)
    if (!fs.exists(j)) return
    val in = fs.open(j)
    val lines = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    finally in.close()
    if (lines.lastOption.contains("END")) replay(fs, lines)
    fs.delete(new Path(table + ".delete-staging"), true)
    fs.delete(j, false): Unit
  }

  private def replay(fs: org.apache.hadoop.fs.FileSystem,
                     lines: Array[String]): Unit =
    lines.foreach {
      case l if l.startsWith("mv\t") =>
        val Array(_, src, dest) = l.split("\t", 3)
        val (s, d) = (new Path(src), new Path(dest))
        if (fs.exists(s) && !fs.exists(d))
          require(fs.rename(s, d), s"recovery rename $s -> $d failed")
      case l if l.startsWith("old\t") =>
        fs.delete(new Path(new java.net.URI(l.stripPrefix("old\t"))), false): Unit
      case _ => ()
    }

  /** Delete rows whose `idCol` is in `ids` from the parquet table at
    * `table`. Returns per-file accounting. */
  def deleteIds(spark: SparkSession, table: String, idCol: String,
                ids: Seq[Long]): Report = {
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverIfCrashed(fs, table)
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

    // rewrite survivors of the affected files into a staging dir
    // (invisible to readers), then swap under a journal: the complete
    // swap plan — staged→dest renames first, old-file deletes second —
    // commits to the journal BEFORE the first table mutation, so any
    // crash leaves either an untouched table (journal incomplete) or a
    // replayable plan (journal complete, every step idempotent). The
    // rename-before-delete ORDER inside the plan means the worst
    // transient state a reader sees is survivors twice, never survivor
    // loss.
    val staging = new Path(table + ".delete-staging")
    fs.delete(staging, true)
    kept.write.mode("overwrite").parquet(staging.toString)
    val staged = fs.listStatus(staging).filter(_.getPath.getName.endsWith(".parquet"))
    val stamp = System.currentTimeMillis()
    val moves = staged.zipWithIndex.map { case (st, i) =>
      st.getPath -> new Path(table, f"deleted-rewrite-$stamp%d-$i%04d.parquet")
    }
    val j = journalPath(table)
    val out = fs.create(j, true)
    try out.write((
      moves.map { case (s, d) => s"mv\t$s\t$d" } ++
      affectedFiles.map(f => s"old\t$f") :+ "END")
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    moves.foreach { case (s, d) =>
      require(fs.rename(s, d), s"rename $s -> $d failed")
    }
    affectedFiles.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))
    fs.delete(staging, true)
    fs.delete(j, false)
    Report(rowsDeleted, affectedFiles.length.toLong, filesTotal)
  }
}
