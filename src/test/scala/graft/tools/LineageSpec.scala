package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineageSpec extends SparkSpec {

  private def docs = graft.core.Tables.load(spark, sfDir, "documents")
  private def events = graft.core.Tables.load(spark, sfDir, "events")

  test("lineage traces through project, join, aggregate, and window") {
    val df = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(events.select(col("user_id").as("doc_id"), col("event_type")),
        Seq("doc_id"))
      .groupBy("source", "event_type")
      .agg(sum("n_chars").as("total_chars"), count(lit(1)).as("n"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy(desc("total_chars"))))
    val lin = Lineage.columnLineage(df)
    // aggregates inherit their grouping keys' lineage on top of their
    // own expression's inputs (the indirect-lineage rule)
    val keys = Set(("documents.parquet", "source"),
      ("events.parquet", "event_type"))
    assert(lin("total_chars") === keys + (("documents.parquet", "n_chars")))
    assert(lin("source") === Set(("documents.parquet", "source")))
    assert(lin("event_type") === Set(("events.parquet", "event_type")))
    // a per-group count(*) carries exactly the keys' lineage
    assert(lin("n") === keys)
    // the window rank is a function of its partition + order columns
    assert(lin("rk") === keys + (("documents.parquet", "n_chars")))
  }

  test("lineage traces through explode and union, merging branches positionally") {
    val a = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val b = events.select(col("event_id").as("doc_id"),
      col("event_type").as("tok"))
    val lin = Lineage.columnLineage(a.unionByName(b))
    assert(lin("tok") === Set(("documents.parquet", "text"),
      ("events.parquet", "event_type")))
    assert(lin("doc_id") === Set(("documents.parquet", "doc_id"),
      ("events.parquet", "event_id")))
  }

  test("tier-served queries trace to the tier's SOURCE tables, not the store path") {
    def tables(name: String): Set[String] = {
      val df = graft.queries.Registry.queries(name)(spark, sfDir)
      val t = Lineage.columnLineage(df).valuesIterator.flatten.map(_._1).toSet
      graft.core.Caching.releaseAll()
      t
    }
    // g1 serves from the purchase tier (lineitem⋈orders)
    val g1 = tables("g1_pagerank")
    assert(g1.contains("lineitem") && g1.contains("orders"), s"g1 traced to $g1")
    assert(!g1.exists(_.matches("v=?\\d+")) && !g1.contains("purchase"),
      s"g1 must not leak store paths: $g1")
    // d8 serves from lsh_components (documents)
    val d8 = tables("d8_dup_clusters")
    assert(d8.contains("documents"), s"d8 traced to $d8")
    // s12 serves from the pq_index dir tier (embeddings)
    val s12 = tables("s12_ivf_pq")
    assert(s12.contains("embeddings"), s"s12 traced to $s12")
  }

  test("every registry query's output resolves, and value columns have inputs") {
    // plan-only: never touches data, so the whole registry is cheap
    val noInput = graft.queries.Registry.queries.keys.toSeq.sorted.flatMap { n =>
      val df = graft.queries.Registry.queries(n)(spark, sfDir)
      val lin = Lineage.columnLineage(df)
      graft.core.Caching.releaseAll()
      // every output column is present in the map
      assert(lin.size === df.columns.distinct.length, s"$n lost columns")
      if (lin.valuesIterator.forall(_.isEmpty)) Seq(n) else Nil
    }
    // no query may be ALL-constant (some queries legitimately carry
    // count(*)/literal columns, but at least one output must trace to
    // a source column). Declared exception: c20's every output is a
    // RANK or a count-of-ranks — its data dependence flows through
    // sort ORDER (control lineage), which the walker declares out of
    // scope alongside filters.
    val rankOnly = Set("c20_epoch_shuffle")
    assert(noInput.filterNot(rankOnly).isEmpty, s"all-constant lineage: $noInput")
  }
}
