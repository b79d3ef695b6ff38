package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {

  test("tokenizer emits (term, tag) structs with coarse POS buckets") {
    val s = spark
    import s.implicits._
    val df = Keywords.tokenize(Seq("Spark 30 rows!").toDF("text"))
    val toks = df.select(explode(col("tokens")).as("t"))
      .select("t.term", "t.tag").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(toks.toSeq == Seq(("spark", "NNG"), ("30", "SN"), ("rows!", "SY")))
  }

  test("top keywords are ranked 1..5 per doc with no ties") {
    val k = Keywords.k1TopKeywords(spark, sfDir)
    val bad = k.groupBy("doc_id", "kywr_rank").count().filter(col("count") > 1)
    assert(bad.isEmpty)
    assert(k.filter(col("kywr_rank") > 5).isEmpty)
    assert(k.filter(col("keyword").isin("the", "a", "of")).isEmpty)
  }
}
