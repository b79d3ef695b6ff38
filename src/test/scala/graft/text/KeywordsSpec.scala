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

  test("CountVectorizer TF vectors match the sparse token counts") {
    val tf = Keywords.tfVectors(spark, sfDir)
    val row = tf.filter(col("doc_id") === 0).collect()(0)
    val vec = row.getAs[org.apache.spark.ml.linalg.SparseVector]("tf")
    // nnz == distinct tokens of doc 0; total == token count of doc 0
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 0)
      .select(explode(expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')")).as("t"))
    assert(vec.numNonzeros == toks.distinct().count())
    assert(vec.values.sum.round == toks.count())
  }

  test("top keywords are ranked 1..5 per doc with no ties") {
    val k = Keywords.k1TopKeywords(spark, sfDir)
    val bad = k.groupBy("doc_id", "kywr_rank").count().filter(col("count") > 1)
    assert(bad.isEmpty)
    assert(k.filter(col("kywr_rank") > 5).isEmpty)
    assert(k.filter(col("keyword").isin("the", "a", "of")).isEmpty)
  }
}
