package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.core.Sessions
import graft.queries.Registry

/** Column-level lineage extracted from the ANALYZED Catalyst plan —
  * which source (table, column) leaves feed each output column of a
  * query. This is the data-platform governance primitive (impact
  * analysis: "which reports break if we drop `l_discount`?";
  * provenance: "which inputs can have influenced this exported
  * column?") computed from the plan itself rather than from parsing
  * SQL text, so it is exact for everything Catalyst can express —
  * joins, windows, generators, unions, aggregates — and free at any
  * data scale (it never touches data, only the plan).
  *
  * Mechanics: one post-order walk accumulates `ExprId → leaves`.
  * Leaf relations seed their own attributes (table name taken from
  * the catalog identifier when present, else the scan's root-path
  * basename — Tables.load reads bare parquet dirs); every operator
  * that CREATES attributes (Project, Aggregate, Window, Generate,
  * Expand) maps each new attribute to the union of the leaves of the
  * attributes its defining expression references; everything else
  * passes attributes through by ExprId. Union positionally merges
  * child lineages, matching its merge semantics. A column built only
  * from literals reports an empty leaf set — correct, not missing.
  */
object Lineage {

  type Leaf = (String, String) // (table, column)

  /** Lineage of every output column of `df`, keyed by column name. */
  def columnLineage(df: DataFrame): Map[String, Set[Leaf]] = {
    val acc = mutable.Map.empty[ExprId, Set[Leaf]]

    def leavesOf(e: Expression): Set[Leaf] =
      e.references.iterator.flatMap(a => acc.getOrElse(a.exprId, Set.empty)).toSet

    def record(ne: NamedExpression): Unit =
      acc(ne.exprId) = leavesOf(ne)

    def walk(plan: LogicalPlan): Unit = {
      plan.children.foreach(walk)
      plan match {
        case r: LogicalRelation =>
          val rootPath = r.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.headOption
            case _ => None
          }
          // a DerivedStore tier scan (…/<tier>/v=N) resolves to the
          // SOURCE TABLES its version's fingerprint records — the
          // provenance a governance walk needs ("which raw tables can
          // have influenced this column?"), not the store path. Tier
          // columns coarsen to every source table (column-grain
          // lineage across a tier build would need build-time
          // recording) — the conservative over-approximation, same
          // direction as the object-boundary rule below.
          // the version dir itself (frame tiers read …/v=N) or one
          // level up (directory tiers read …/v=N/postings etc.)
          val versionDir = rootPath.flatMap { p =>
            if (p.getName.matches("v=?\\d+")) Some(p)
            else Option(p.getParent).filter(_.getName.matches("v=?\\d+"))
          }
          val tierSources = versionDir
            .flatMap(p => graft.io.DerivedStore
              .sourcesOfVersion(df.sparkSession, p.toString))
          tierSources match {
            case Some(srcs) =>
              val leaves = srcs.map(t => (t, "*")).toSet
              r.output.foreach(a => acc(a.exprId) = leaves)
            case None =>
              val table = r.catalogTable.map(_.identifier.table).getOrElse(
                rootPath.map(_.getName).getOrElse("<scan>"))
              r.output.foreach(a => acc(a.exprId) = Set((table, a.name)))
          }
        case l: LeafNode =>
          l.output.foreach(a => acc(a.exprId) = Set(("<local>", a.name)))
        case p: Project   => p.projectList.foreach(record)
        case a: Aggregate =>
          // group membership shapes every aggregate's value, so each
          // aggregate column also inherits the grouping keys' lineage
          // (the standard indirect-lineage rule — it is what keeps a
          // per-group count(*) attributable to the column it counts
          // BY). Filter/control lineage is declared out of scope.
          val keys = a.groupingExpressions.iterator.flatMap(leavesOf).toSet
          a.aggregateExpressions.foreach { ne =>
            val aggregates = ne.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])
            acc(ne.exprId) = leavesOf(ne) ++ (if (aggregates) keys else Set.empty)
          }
        case w: Window    => w.windowExpressions.foreach(record)
        case g: Generate =>
          val src = leavesOf(g.generator)
          g.generatorOutput.foreach(a => acc(a.exprId) = src)
        case e: Expand =>
          // each output attr derives from the attrs at its position
          // across every projection row
          e.output.zipWithIndex.foreach { case (a, i) =>
            acc(a.exprId) = e.projections.iterator
              .flatMap(row => leavesOf(row(i))).toSet
          }
        case u: Union =>
          u.output.zipWithIndex.foreach { case (a, i) =>
            acc(a.exprId) = u.children.iterator
              .flatMap(c => acc.getOrElse(c.output(i).exprId, Set.empty[Leaf]))
              .toSet
          }
        case other =>
          // pass-through for attrs the children already resolved;
          // attrs CREATED by an unhandled node (object boundaries:
          // mapPartitions / mapGroups / typed Aggregators and their
          // Serialize/Deserialize/AppendColumns plumbing) coarsen to
          // every input column of the stage — a conservative
          // over-approximation, which is the safe direction for
          // impact analysis ("may depend on", never "can't").
          lazy val childLeaves = other.children.iterator
            .flatMap(_.output)
            .flatMap(a => acc.getOrElse(a.exprId, Set.empty[Leaf]))
            .toSet
          other.output.foreach { a =>
            if (!acc.contains(a.exprId)) acc(a.exprId) = childLeaves
          }
      }
    }

    val analyzed = df.queryExecution.analyzed
    walk(analyzed)
    analyzed.output.map(a =>
      a.name -> acc.getOrElse(a.exprId, Set.empty[Leaf])).toMap
  }

  /** Render one query's lineage as sorted `col <- table.col, ...` lines. */
  def render(df: DataFrame): Seq[String] =
    columnLineage(df).toSeq.sortBy(_._1).map { case (col, leaves) =>
      val src =
        if (leaves.isEmpty) "(no column inputs)"
        else leaves.toSeq.sorted.map { case (t, c) => s"$t.$c" }.mkString(", ")
      s"$col <- $src"
    }

  /** CLI: `Lineage <sfDir> [queryName...]` — prints lineage for the
    * named registry queries (all of them when none given). */
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, appName = "graft-lineage")
    try {
      val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
      val names =
        if (args.length > 1) args.drop(1).toSeq else Registry.queries.keys.toSeq.sorted
      names.foreach { n =>
        println(s"======== $n ========")
        Registry.queries(n)(spark, sfDir).transform { df =>
          render(df).foreach(println); df
        }
        graft.core.Caching.releaseAll()
      }
    } finally spark.stop()
  }
}
