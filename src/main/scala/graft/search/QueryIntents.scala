package graft.search

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The DETERMINISTIC half of the reference's NL→search endpoint
  * (`Openapi/openai_elasticsearch.py`), compiled instead of prompted.
  *
  * The reference wraps an LLM call with machinery that is itself a
  * compiler: a field-mapping taxonomy of display-name → (field name,
  * type ∈ {string, date, array, nested}) entries
  * (`openai_elasticsearch.py:34-54`), fixed query templates —
  * `returnQuery`'s query_string-over-fields (`:160-170`) and
  * `empInfoQuery`'s match + `_source` projection (`:173-198`) — and
  * format rules enforced by prompt: bool queries as
  * `{"query": {"bool": {}}}` (`:84-86`), and `.keyword`/`.text`
  * suffixes stripped from field names (`:66-68`, applied at `:139`).
  * The LLM's only job is picking intents; everything downstream is
  * deterministic. This object implements that downstream: typed
  * intents resolve against a [[Taxonomy]] and emit exactly the DSL
  * JSON subset [[SearchDsl]] compiles to Catalyst predicates — so a
  * "generated" query is hash-checkable against a direct-scan oracle
  * (q77). The LLM call itself stays out of scope (public-knowledge
  * constraint); any intent source — rules, UI, a model — plugs in
  * above this seam.
  */
object QueryIntents {

  sealed trait FieldType
  case object StringField extends FieldType
  case object NumberField extends FieldType
  case object DateField   extends FieldType
  /** Reference `속성:array` — multi-valued keyword fields. */
  case object ArrayField  extends FieldType
  /** Reference `속성:nested` — array-of-struct sub-documents
    * (`nested_duty`/`nested_trin`, `openai_elasticsearch.py:47-54`). */
  case object NestedField extends FieldType

  /** One taxonomy row (`{이름:…, 필드명:…, 속성:…}`). */
  final case class Field(display: String, name: String, tpe: FieldType)

  /** The field-mapping block the reference embeds in its prompt,
    * as data. Resolution accepts the display name OR the field name,
    * and strips the `.keyword`/`.text` suffixes the reference's
    * format rule removes — so intents written against either naming
    * convention land on the same typed field.
    */
  final case class Taxonomy(fields: Seq[Field]) {
    private val byKey: Map[String, Field] =
      (fields.map(f => f.display -> f) ++ fields.map(f => f.name -> f)).toMap
    def resolve(key: String): Field = {
      val clean = key.stripSuffix(".keyword").stripSuffix(".text")
      byKey.getOrElse(clean,
        throw new IllegalArgumentException(
          s"unknown field '$key' (reference rule: avoid fields that do not exist)"))
    }
  }

  /** Typed query intents — the structured output the reference asks
    * its model for, minus the model.
    */
  sealed trait Intent
  /** Exact value on a typed field → `term`. */
  final case class Equals(field: String, value: Any) extends Intent
  /** Membership → `terms`. */
  final case class OneOf(field: String, values: Seq[Any]) extends Intent
  /** Analyzed-text containment on one field → `match`
    * (`empInfoQuery`'s template, `:196`). */
  final case class ContainsText(field: String, text: String) extends Intent
  /** Free text over several fields → `query_string`
    * (`returnQuery`'s template, `:161-168`). */
  final case class FreeText(text: String, fields: Seq[String]) extends Intent
  /** Half-open/closed bounds → `range`; DateField values pass through
    * as the reference's yyyyMMdd-style strings. */
  final case class InRange(field: String, gte: Option[Any] = None,
                           lt: Option[Any] = None) extends Intent
  /** Field present → `exists`. */
  final case class HasField(field: String) extends Intent
  /** Negation → the bool `must_not` clause. */
  final case class Not(intent: Intent) extends Intent
  /** Sub-document match on a NestedField → the `nested` node with the
    * reference's `{"path", "query"}` format (`:89-90`); matches when
    * ANY sub-document satisfies all inner intents. */
  final case class Nested(path: String, inner: Seq[Intent]) extends Intent

  private val mapper = new ObjectMapper()

  /** Compile intents to the `{"query": {"bool": {"must": [...],
    * "must_not": [...]}}}` envelope (`:84-86`). Output is exactly the
    * [[SearchDsl]] input grammar — `SearchDsl.compile(toDsl(...))` is
    * the full NL-endpoint pipeline minus the model.
    */
  def toDsl(tax: Taxonomy, intents: Seq[Intent]): String = {
    val root = mapper.createObjectNode()
    val bool = root.putObject("query").putObject("bool")
    val must = bool.putArray("must")
    val mustNot = bool.putArray("must_not")
    intents.foreach {
      case Not(inner) => appendIntent(tax, mustNot, inner)
      case other      => appendIntent(tax, must, other)
    }
    if (mustNot.isEmpty) bool.remove("must_not"): Unit
    mapper.writeValueAsString(root)
  }

  private def appendIntent(tax: Taxonomy, arr: ArrayNode, i: Intent): Unit = i match {
    case Equals(f, v) =>
      putValue(arr.addObject().putObject("term"), tax.resolve(f).name, v)
    case OneOf(f, vs) =>
      val values = arr.addObject().putObject("terms").putArray(tax.resolve(f).name)
      vs.foreach(addValue(values, _))
    case ContainsText(f, text) =>
      val fld = tax.resolve(f)
      require(fld.tpe == StringField || fld.tpe == ArrayField,
        s"match needs a text field, got ${fld.tpe} for '$f'")
      arr.addObject().putObject("match").put(fld.name, text): Unit
    case FreeText(text, fs) =>
      val qs = arr.addObject().putObject("query_string")
      qs.put("query", text)
      val fieldsArr = qs.putArray("fields")
      fs.foreach(f => fieldsArr.add(tax.resolve(f).name))
    case InRange(f, gte, lt) =>
      require(gte.nonEmpty || lt.nonEmpty, s"empty range for '$f'")
      val bounds = arr.addObject().putObject("range").putObject(tax.resolve(f).name)
      gte.foreach(putValue(bounds, "gte", _))
      lt.foreach(putValue(bounds, "lt", _))
    case HasField(f) =>
      arr.addObject().putObject("exists").put("field", tax.resolve(f).name): Unit
    case Nested(path, inner) =>
      val fld = tax.resolve(path)
      require(fld.tpe == NestedField,
        s"nested needs a nested field, got ${fld.tpe} for '$path'")
      val o = arr.addObject().putObject("nested")
      o.put("path", fld.name)
      val bool = o.putObject("query").putObject("bool")
      val must = bool.putArray("must")
      val mustNot = bool.putArray("must_not")
      inner.foreach {
        case Not(i) => appendIntent(tax, mustNot, i)
        case i      => appendIntent(tax, must, i)
      }
      if (mustNot.isEmpty) bool.remove("must_not"): Unit
    case Not(_) =>
      throw new IllegalArgumentException("nested Not is not in the reference grammar")
  }

  private def putValue(o: ObjectNode, key: String, v: Any): Unit = v match {
    case s: String => o.put(key, s): Unit
    case l: Long   => o.put(key, l): Unit
    case i: Int    => o.put(key, i.toLong): Unit
    case d: Double => o.put(key, d): Unit
    case b: Boolean => o.put(key, b): Unit
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private def addValue(a: ArrayNode, v: Any): Unit = v match {
    case s: String => a.add(s): Unit
    case l: Long   => a.add(l): Unit
    case i: Int    => a.add(i.toLong): Unit
    case d: Double => a.add(d): Unit
    case b: Boolean => a.add(b): Unit
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  // =========================================================================
  // q77 — the generated-query retrieval, oracle-checked
  // =========================================================================

  /** The events table's taxonomy, shaped like the reference's field
    * block (`:34-54`): display name, physical field, type.
    */
  val eventsTaxonomy: Taxonomy = Taxonomy(Seq(
    Field("event type",  "event_type", StringField),
    Field("properties",  "props",      StringField),
    Field("user number", "user_id",    NumberField),
    Field("event value", "value",      NumberField),
    Field("event time",  "ts",         DateField)))

  /** q77 — retrieval via a COMPILED intent query: the `returnQuery`
    * free-text template over two fields + a numeric range + a
    * must_not, with one field referenced `.keyword`-suffixed to
    * exercise the reference's strip rule. The DSL JSON is generated
    * by [[toDsl]], compiled by [[SearchDsl.compile]], and the result
    * is hash-matched against a direct hand-written scan in DuckDB —
    * q69's discipline applied to generated queries: if the generator
    * or the compiler drifts, the hash gate trips.
    */
  val q77IntentQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    val dsl = toDsl(eventsTaxonomy, Seq(
      FreeText("pur", Seq("event type", "properties")),
      InRange("event value", gte = Some(1.0)),
      HasField("user number"),
      Not(OneOf("event_type.keyword", Seq("error")))))
    Tables.load(s, dir, "events")
      .filter(SearchDsl.compile(dsl))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  val q77IntentQuerySql: String = """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type LIKE '%pur%' OR props LIKE '%pur%')
      AND value >= 1.0
      AND user_id IS NOT NULL
      AND NOT event_type IN ('error')"""

  // =========================================================================
  // q78 — nested sub-document retrieval through the whole chain
  // =========================================================================

  /** Taxonomy for the per-customer document with its orders as nested
    * sub-documents — the `nested_duty`-style shape (`:47-50`).
    */
  val customerOrdersTaxonomy: Taxonomy = Taxonomy(Seq(
    Field("order history", "nested_orders", NestedField),
    Field("order status",  "status",        StringField),
    Field("order price",   "price",         NumberField)))

  /** q78 — the full ES-parity chain for nested documents: assemble
    * array<struct> sub-documents per customer (the J2/A5 document
    * model), express "customers with a finished order ≥ 400k" as a
    * [[Nested]] intent, compile to the reference's `{"path","query"}`
    * nested node, and execute via [[SearchDsl]]'s `exists`
    * higher-order function — per-row lambda over the array, no
    * explode, no join. The oracle answers the same question from the
    * FLAT orders table (`bool_or` under GROUP BY), so the hash gate
    * proves nested-document semantics against first principles,
    * q69-style.
    */
  val q78NestedQuery: (SparkSession, String) => DataFrame = (s, dir) => {
    val nested = Tables.load(s, dir, "orders")
      .select(col("o_custkey"),
        struct(col("o_orderkey").as("okey"),
               col("o_orderstatus").as("status"),
               col("o_totalprice").as("price")).as("o"))
      .groupBy("o_custkey")
      .agg(collect_list(col("o")).as("nested_orders"))
    val dsl = toDsl(customerOrdersTaxonomy, Seq(
      Nested("order history", Seq(
        Equals("order status", "F"),
        InRange("order price", gte = Some(400000.0))))))
    nested.filter(SearchDsl.compile(dsl))
      .select(col("o_custkey"),
        size(col("nested_orders")).cast("long").as("n_orders"))
  }

  val q78NestedQuerySql: String = """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING bool_or(o_orderstatus = 'F' AND o_totalprice >= 400000.0)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q77_intent_query" -> q77IntentQuery,
        "q78_nested_query" -> q78NestedQuery)
  val oracleSql: Map[String, String] =
    Map("q77_intent_query" -> q77IntentQuerySql,
        "q78_nested_query" -> q78NestedQuerySql)
}
