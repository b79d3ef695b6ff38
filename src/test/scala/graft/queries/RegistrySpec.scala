package graft.queries

import graft.SparkSpec

class RegistrySpec extends SparkSpec {

  /** Queries deliberately WITHOUT a SQL oracle. Empty since round 8:
    * even c16's stateful BFD fold turned out to be DuckDB-expressible
    * (recursive CTE carrying the open-bin list as a LIST<STRUCT>
    * column — `Corpus.c16BestfitPackSql`). Adding a name here without
    * a semantic spec is a coverage hole — keep this set justified
    * entry by entry.
    */
  private val specGatedOnly = Set.empty[String]

  test("every query has an oracle and every oracle a query") {
    assert(Registry.queries.keySet -- specGatedOnly == Registry.oracleSql.keySet)
    assert(specGatedOnly.subsetOf(Registry.queries.keySet))
    assert((Registry.oracleSql.keySet & specGatedOnly).isEmpty)
  }

  test("all registry queries execute on sf0.001") {
    graft.core.Tables.registerAll(spark, sfDir)
    Registry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("queries are deterministic across runs (sample)") {
    for (name <- Seq("q4_doc_assembly", "q6_listagg_distinct",
                     "d2_minhash_signature", "s1_cosine_topk")) {
      val a = Registry.queries(name)(spark, sfDir)
      val b = Registry.queries(name)(spark, sfDir)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, name)
    }
  }
}
