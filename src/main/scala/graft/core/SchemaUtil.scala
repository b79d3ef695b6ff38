package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Schema utilities mirroring the reference's schema handling:
  *
  *  - `relaxNullability`: the reference re-reads every frame with all
  *    columns forced nullable before writing, to tolerate warehouse
  *    DDL drift (`AWS_GLUE_ETL.py:111-117`, `comlib.py:281-311`).
  *    Here it is a single metadata pass — no second scan.
  *  - `diffColumns`: the backup job asserts source columns == backup
  *    columns minus the partition key (`BkupRs.py:123-166`).
  */
object SchemaUtil {
  def relaxNullability(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      val dt = f.dataType match {
        case st: StructType => relaxNullability(st)
        case other          => other
      }
      f.copy(dataType = dt, nullable = true)
    })

  def relaxNullability(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, relaxNullability(df.schema))

  /** Columns present in exactly one of the two schemas (by name). */
  def diffColumns(a: StructType, b: StructType): (Seq[String], Seq[String]) = {
    val an = a.fieldNames.toSet
    val bn = b.fieldNames.toSet
    ((an -- bn).toSeq.sorted, (bn -- an).toSeq.sorted)
  }

  /** Hard gate used by the backup job: schemas must agree modulo the
    * named extra columns on side b (e.g. `bkup_dt`).
    */
  def assertSameColumns(src: StructType, bkp: StructType,
                        ignoreInBkp: Set[String] = Set.empty): Unit = {
    val (onlySrc, onlyBkp) = diffColumns(src, bkp)
    val extra = onlyBkp.filterNot(ignoreInBkp)
    require(onlySrc.isEmpty && extra.isEmpty,
      s"DDL drift: only-in-src=$onlySrc only-in-backup=$extra")
  }
}
