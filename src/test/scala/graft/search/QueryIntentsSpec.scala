package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.search.QueryIntents._

class QueryIntentsSpec extends SparkSpec {

  test("intents compile to the reference's bool-query envelope and round-trip through SearchDsl") {
    val dsl = toDsl(eventsTaxonomy, Seq(
      Equals("event type", "click"),
      InRange("event value", gte = Some(2.0), lt = Some(10.0)),
      Not(OneOf("user number", Seq(7L)))))
    // envelope shape rule (`openai_elasticsearch.py:84-86`)
    assert(dsl.startsWith("""{"query":{"bool":"""))
    assert(dsl.contains(""""must_not":[{"terms":{"user_id":[7]}}]"""))
    // the generated JSON is valid SearchDsl input and filters like the
    // hand-written predicate
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val viaDsl = ev.filter(SearchDsl.compile(dsl)).select("event_id")
    val byHand = ev.filter(col("event_type") === "click" &&
        col("value") >= 2.0 && col("value") < 10.0 &&
        !col("user_id").isin(7L))
      .select("event_id")
    assert(viaDsl.exceptAll(byHand).isEmpty && byHand.exceptAll(viaDsl).isEmpty)
  }

  test("taxonomy resolves display names and strips .keyword/.text; unknown fields are rejected") {
    // display name and physical name land on the same field
    assert(eventsTaxonomy.resolve("event type").name == "event_type")
    assert(eventsTaxonomy.resolve("event_type").name == "event_type")
    // the reference's format rule: remove .keyword / .text suffixes
    assert(eventsTaxonomy.resolve("event_type.keyword").name == "event_type")
    assert(eventsTaxonomy.resolve("props.text").name == "props")
    // "avoid using fields that do not exist" — hard error, not silence
    intercept[IllegalArgumentException] { eventsTaxonomy.resolve("no_such") }
    intercept[IllegalArgumentException] {
      toDsl(eventsTaxonomy, Seq(Equals("ghost_field", 1L)))
    }
  }

  test("nested intent compiles to the {path, query} node and matches per sub-document") {
    val s = spark
    import s.implicits._
    val dsl = toDsl(customerOrdersTaxonomy, Seq(
      Nested("order history", Seq(
        Equals("order status", "F"),
        InRange("order price", gte = Some(100.0))))))
    // the reference's nested format rule (`openai_elasticsearch.py:89-90`)
    assert(dsl.contains(""""nested":{"path":"nested_orders","query":{"bool":"""))
    // semantics: BOTH inner conditions must hold on the SAME
    // sub-document — the thing a flattened AND would get wrong
    val docs = Seq(
      (1L, Seq(("F", 50.0), ("O", 500.0))),  // F but cheap; pricey but O -> no
      (2L, Seq(("F", 150.0))),               // one sub-doc satisfies both -> yes
      (3L, Seq.empty[(String, Double)]))     // no sub-docs -> no
      .toDF("cust", "raw")
      .select(col("cust"), expr(
        "transform(raw, r -> named_struct('okey', 0L, 'status', r._1, 'price', r._2))")
        .as("nested_orders"))
    val hits = docs.filter(SearchDsl.compile(dsl)).select("cust")
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(2L))
    // type discipline: nesting on a non-nested field is rejected
    intercept[IllegalArgumentException] {
      toDsl(customerOrdersTaxonomy, Seq(Nested("order status", Seq.empty)))
    }
  }

  test("returnQuery template: FreeText compiles to query_string over resolved fields") {
    val dsl = toDsl(eventsTaxonomy,
      Seq(FreeText("refund", Seq("event type", "properties"))))
    assert(dsl.contains(""""query_string":{"query":"refund","fields":["event_type","props"]}"""))
    // semantics: any-field contains
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val viaDsl = ev.filter(SearchDsl.compile(dsl))
    val byHand = ev.filter(col("event_type").contains("refund") ||
      col("props").contains("refund"))
    assert(viaDsl.count() == byHand.count())
  }
}
