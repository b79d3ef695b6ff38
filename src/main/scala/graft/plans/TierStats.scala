package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registry mapping a published tier VERSION directory (qualified URI
  * string) to the exact (rowCount, sizeInBytes) its publish recorded in
  * the `_stats` sidecar. `DerivedStore` registers every version it
  * serves; [[TierStatsRule]] feeds the numbers to Catalyst.
  *
  * Version dirs are immutable once committed (OCC publish + vacuum
  * deletes whole dirs), so entries never go stale — a superseded
  * version simply stops being scanned. Bounded by the number of
  * distinct versions a JVM serves; cleared wholesale at a cap as a
  * leak backstop. */
object TierStatsCatalog {
  /** rows, bytes, and measured avg widths of var-width columns — the
    * widths matter because default-width pricing UNDERESTIMATES wide
    * payloads (string=20B, array=element size), the direction that
    * wrongly broadcasts. */
  final case class Entry(rows: Long, bytes: Long, avgLen: Map[String, Long])

  private val byDir = new ConcurrentHashMap[String, Entry]()
  private val Cap = 4096

  def register(versionDir: String, rows: Long, bytes: Long,
               avgLen: Map[String, Long] = Map.empty): Unit = {
    if (byDir.size >= Cap) byDir.clear()
    byDir.put(versionDir, Entry(rows, bytes, avgLen)): Unit
  }

  private[plans] def lookup(versionDir: String): Option[Entry] =
    Option(byDir.get(versionDir))

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
  * Requires `spark.sql.cbo.planStats.enabled` (set in the engine's
  * sessions): rowCount-based estimation without full CBO join reorder.
  *
  * Idempotent and convergent under the fixed-point optimizer batch: a
  * relation that already carries a catalogTable is never rewritten. */
case class TierStatsRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case lr @ LogicalRelation(fsRel: HadoopFsRelation, _, None, _, _)
        if fsRel.location.rootPaths.length == 1 =>
      val root = fsRel.location.rootPaths.head.toString
      TierStatsCatalog.lookup(root) match {
        case Some(e) =>
          val colStats = e.avgLen.collect {
            case (name, len) if fsRel.schema.fieldNames.contains(name) =>
              name -> CatalogColumnStat(avgLen = Some(len), maxLen = Some(len))
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
