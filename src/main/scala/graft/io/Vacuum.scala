package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Orphan/stale-version GC for [[AtomicPublish]]'s versioned layout —
  * the maintenance half of snapshot-as-directory storage: every
  * publish leaves the previous `v=n` dir behind as a time-travel
  * snapshot, and a crashed publish can leave an UNCOMMITTED dir (no
  * `_SUCCESS`), so without a vacuum the table's footprint grows
  * without bound. (Reference analogue: the daily backup dirs that
  * `Talent_Opportunity_Platform/backup.py` prunes by date — here the
  * prune is version- and commit-state-aware instead of name-based.)
  *
  * Deletion rules, applied together in one listing pass:
  *  - committed versions (have `_SUCCESS`): keep the newest
  *    `keepVersions`, delete the rest — old snapshots age out oldest
  *    first, and the CURRENT version is always inside the keep window
  *    (`keepVersions >= 1` is enforced);
  *  - uncommitted dirs (torn `v=n` without `_SUCCESS`, and orphaned
  *    `.tx-` OCC staging): delete only when their modification time is
  *    older than `graceMs` — a publish IN FLIGHT right now is
  *    uncommitted and must not be swept from under the writer. The
  *    grace default (1h) is far beyond any single parquet commit.
  *
  * Safety order: candidates are computed from ONE directory listing,
  * then deleted individually; a concurrent publish creates a NEW
  * `v=max+1` dir which is never in the candidate set, so vacuum and
  * publish can run unsynchronized (same discipline as
  * `Backup.retentionSweep`). Deletes are per-version-dir renames into
  * oblivion on HDFS-likes and batched object deletes on stores — cost
  * scales with the number of EXPIRED versions, never table size.
  *
  * Driver-side `listStatus` is one RPC per table directory (version
  * count, not data size) — the same bounded-metadata pattern as
  * `Incremental`'s partition diff.
  */
object Vacuum {

  /** What a sweep would / did remove. */
  final case class Report(deletedCommitted: Seq[Long],
                          deletedUncommitted: Seq[String],
                          keptVersions: Seq[Long]) {
    def deletedCount: Int = deletedCommitted.size + deletedUncommitted.size
  }

  /** Sweep one versioned table dir. `dryRun = true` reports without
    * deleting (the audit mode a production job runs first).
    */
  def sweep(spark: SparkSession, table: String,
            keepVersions: Int = 3,
            graceMs: Long = 60L * 60 * 1000,
            dryRun: Boolean = false,
            nowMs: Long = System.currentTimeMillis()): Report = {
    require(keepVersions >= 1,
      s"keepVersions must be >= 1 (the current version is never vacuumed), got $keepVersions")
    val dir = new Path(table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Report(Nil, Nil, Nil)

    val all = fs.listStatus(dir).toSeq
    val entries = all
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
    val (committed, uncommitted0) = entries.partition(s =>
      fs.exists(new Path(s.getPath, "_SUCCESS")))
    // orphaned OCC staging (.tx- dirs from a crashed stageVersion /
    // DerivedStore build) ages out under the same mtime grace — a
    // stager IN FLIGHT is shielded exactly like a torn v= dir
    val uncommitted = uncommitted0 ++ all
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tx-"))

    val byVersion = committed
      .map(s => s.getPath.getName.stripPrefix("v=").toLong -> s.getPath)
      .sortBy(-_._1)
    val (kept, expired) = byVersion.splitAt(keepVersions)
    val staleUncommitted = uncommitted
      .filter(s => nowMs - s.getModificationTime > graceMs)
      .map(_.getPath)

    if (!dryRun) {
      expired.foreach { case (_, p) => fs.delete(p, true) }
      staleUncommitted.foreach(p => fs.delete(p, true))
    }
    Report(
      deletedCommitted = expired.map(_._1),
      deletedUncommitted = staleUncommitted.map(_.getName),
      keptVersions = kept.map(_._1))
  }
}
