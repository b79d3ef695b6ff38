package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** One column's measured statistics, as a stats producer recorded them
  * (`TableStats.columnProfile`, a tier publish's `_stats` sidecar):
  * avg/max byte widths for var-width columns (the default-width
  * mispricing fix), NDV + null count for atomic columns (what
  * join-cardinality estimation keys on), and value min/max for NUMERIC
  * columns in `CatalogColumnStat`'s external-string form — required,
  * not decorative: Spark's `JoinEstimation` intersects the two key
  * sides' `ValueInterval`s before applying the NDV formula, and a
  * numeric column without min/max becomes a `NullValueInterval` that
  * intersects NOTHING, zeroing every join estimate through it. Every
  * field is honest-or-absent (r13 advice: maxLen used to repeat the
  * AVERAGE — a lie a future estimator could trust). */
final case class ColStat(avgLen: Option[Long], maxLen: Option[Long],
                         ndv: Option[Long], nulls: Option[Long],
                         min: Option[String] = None,
                         max: Option[String] = None)

object ColStat {
  val empty: ColStat = ColStat(None, None, None, None, None, None)
}

/** Registry mapping a stats-carrying scan root (qualified URI string —
  * a published tier VERSION dir, or a raw warehouse table dir) to the
  * exact (rowCount, sizeInBytes, column profile) its producer measured.
  * `DerivedStore` registers every version it serves from its `_stats`
  * sidecar; `TableStats.analyze` registers raw tables;
  * [[TierStatsRule]] feeds the numbers to Catalyst.
  *
  * Staleness: version dirs are immutable once committed, BUT a
  * long-lived JVM can see a store wiped and rebuilt at the same v=N
  * path, and raw tables are reloaded in place — so every entry carries
  * a content signature (len:mtime of the `_stats` sidecar for tiers,
  * mtime of the table dir for raw tables) and [[TierStatsRule]]
  * revalidates it with ONE getFileStatus before trusting the numbers
  * (r13 advice #2: a path-keyed entry with no signature fed the old
  * corpus's row count to any scan planned between the wipe and the
  * next serve — the wrongly-broadcast direction). Bounded by an LRU
  * (r13 verdict #4: the previous clear-ALL-at-cap backstop
  * cold-restarted every tier's stats the moment one more than the cap
  * was served). */
object TierStatsCatalog {
  final case class Entry(rows: Long, bytes: Long, cols: Map[String, ColStat],
                         sigPath: String, sig: String)

  private val byDir = new graft.core.LruMap[String, Entry](4096)

  /** Content signature of `path`: len:mtime for files; for directories
    * a hash over the one-level child listing's (name, len, mtime) —
    * dir mtime alone misses a loader that rewrites file CONTENTS under
    * the same names (`cp` over part files, rsync --inplace), which
    * changes each FILE's len/mtime but not the dir's (r14 review).
    * One listStatus per registered raw-table scan per plan; the raw
    * warehouse layout is flat, so the one-level listing sees every
    * data file. "absent" for a missing path, so a deleted sidecar
    * invalidates rather than matches. */
  def sigOf(conf: org.apache.hadoop.conf.Configuration, path: String): String =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val entries = fs.listStatus(p).map(e =>
          s"${e.getPath.getName}:${e.getLen}:${e.getModificationTime}")
        s"dir:${entries.length}:${scala.util.hashing.MurmurHash3
          .orderedHash(entries.sorted.toSeq)}"
      } else s"${st.getLen}:${st.getModificationTime}"
    }.getOrElse("absent")

  def register(scanRoot: String, rows: Long, bytes: Long,
               cols: Map[String, ColStat] = Map.empty,
               sigPath: String = "", sig: String = ""): Unit =
    byDir.put(scanRoot, Entry(rows, bytes, cols, sigPath, sig))

  /** The entry for `scanRoot`, revalidated against its recorded content
    * signature (one metadata RPC); a stale entry is evicted and the
    * scan falls back to file-size estimation until the next
    * register. An unsigned entry (legacy producer) is trusted as-is. */
  private[plans] def lookupValid(conf: org.apache.hadoop.conf.Configuration,
                                 scanRoot: String): Option[Entry] =
    byDir.get(scanRoot).flatMap { e =>
      if (e.sig.isEmpty || sigOf(conf, e.sigPath) == e.sig) Some(e)
      else { byDir.remove(scanRoot); None }
    }

  private[graft] def lookup(scanRoot: String): Option[Entry] =
    byDir.get(scanRoot)

  private[graft] def clear(): Unit = byDir.clear()
}

/** Feed publish-time sidecar stats into Catalyst (r12 verdict #4): a
  * parquet scan rooted at a registered tier version gets a
  * `CatalogTable` carrying exact rowCount + sizeInBytes, so the
  * optimizer's estimates come from what the publish COUNTED instead of
  * raw file bytes. The practical win is join-side sizing: a tier with a
  * wide payload column joined on its narrow key looks huge under the
  * file-size estimate (the size-only visitor scales projections by
  * DEFAULT type widths, so a 2KB text column is priced at 20 bytes and
  * the bytes land on the key's side of the ratio), but with a rowCount
  * the stats visitor prices the projected columns directly —
  * `rows × width(key)` — and a dim-sized join side flips to broadcast.
  * Column stats ride along (r13 verdict #2): measured avg/max widths
  * fix the sizing, NDV + null count feed `JoinEstimation`'s
  * `rows₁·rows₂ / max(ndv₁, ndv₂)` cardinality formula, so estimates
  * THROUGH a join stop being ratio guesses. Requires
  * `spark.sql.cbo.planStats.enabled` (set in the engine's sessions):
  * rowCount-based estimation without full CBO join reorder.
  *
  * Idempotent and convergent under the fixed-point optimizer batch: a
  * relation that already carries a catalogTable is never rewritten. */
case class TierStatsRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case lr @ LogicalRelation(fsRel: HadoopFsRelation, _, None, _, _)
        if fsRel.location.rootPaths.length == 1 =>
      val root = fsRel.location.rootPaths.head.toString
      TierStatsCatalog.lookupValid(
        session.sparkContext.hadoopConfiguration, root) match {
        case Some(e) =>
          val colStats = e.cols.collect {
            case (name, cs) if fsRel.schema.fieldNames.contains(name) =>
              // NDV is attached only when the interval story is sound:
              // JoinEstimation guards on count stats alone and then
              // intersects ValueIntervals, and a non-string column
              // WITH distinctCount but WITHOUT min/max becomes a
              // NullValueInterval that intersects nothing — the join
              // estimate collapses to zero and broadcasts the world.
              // String/Binary get a DefaultValueInterval (intersects
              // everything), so their NDV is safe bound-less. An NDV
              // withheld here still lives in the sidecar; it simply
              // waits for bounds (a Date/Timestamp key today, a
              // merge-degraded numeric) before steering cardinality.
              import org.apache.spark.sql.types.{BinaryType, StringType}
              val boundless = fsRel.schema(name).dataType match {
                case StringType | BinaryType => false
                case _ => cs.min.isEmpty || cs.max.isEmpty
              }
              name -> CatalogColumnStat(
                distinctCount = if (boundless) None else cs.ndv.map(BigInt(_)),
                min = cs.min,
                max = cs.max,
                nullCount = cs.nulls.map(BigInt(_)),
                avgLen = cs.avgLen,
                maxLen = cs.maxLen)
          }
          val ct = CatalogTable(
            identifier = TableIdentifier(
              new org.apache.hadoop.fs.Path(root).getName),
            tableType = CatalogTableType.EXTERNAL,
            storage = CatalogStorageFormat.empty.copy(
              // Path.toUri encodes URI-illegal characters (spaces, …);
              // new URI(root) would throw inside the optimizer
              locationUri = Some(new org.apache.hadoop.fs.Path(root).toUri)),
            schema = fsRel.schema,
            provider = Some("parquet"),
            stats = Some(CatalogStatistics(
              sizeInBytes = BigInt(e.bytes), rowCount = Some(BigInt(e.rows)),
              colStats = colStats)))
          lr.copy(catalogTable = Some(ct))
        case None => lr
      }
  }
}
