package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1/F1 — the reference's null-default projection pattern: every
  * output column wrapped `nvl(col, ''/0/0.0) as alias`, 22 columns in
  * one query (`Elastic_indexing.py:108-130`, `log_screen.py:241-251`).
  * This builder derives the default from the column type so the
  * pattern is one call instead of 22 hand-written coalesces, and stays
  * a plain Project (codegen'd, pushdown-transparent).
  */
object Projections {

  def defaultFor(dt: DataType): Column = dt match {
    case StringType                         => lit("")
    case ByteType | ShortType | IntegerType => lit(0)
    case LongType                           => lit(0L)
    case FloatType | DoubleType             => lit(0.0)
    case _: DecimalType                     => lit(0.0)
    case BooleanType                        => lit(false)
    case _                                  => lit(null)
  }

  /** Replace nulls with type-appropriate defaults in every column (or
    * the named subset), preserving names and order.
    */
  def nvlProject(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val target = if (columns.nonEmpty) columns.toSet else df.columns.toSet
    df.select(df.schema.fields.map { f =>
      if (target(f.name) && f.nullable)
        coalesce(col(f.name), defaultFor(f.dataType).cast(f.dataType)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** F14 — the inverse: map sentinel values back to null
    * (`log_screen.py:190-197` `"-"` → None).
    */
  def sentinelToNull(df: DataFrame, sentinels: Seq[String],
                     columns: Seq[String] = Nil): DataFrame = {
    val target = if (columns.nonEmpty) columns.toSet else df.columns.toSet
    df.select(df.schema.fields.map { f =>
      if (target(f.name) && f.dataType == StringType)
        when(col(f.name).isin(sentinels.map(lit): _*), lit(null))
          .otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }
}
