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

  test("golden: reference pynori sample sentence segments to the same term stream") {
    val s = spark
    import s.implicits._
    // The reference's analyzer smoke test (`pynori_test.py:22-28`) runs
    // KoreanAnalyzer(decompound_mode='NONE', discard_punctuation=False)
    // over this sentence and prints zip(termAtt, posTagAtt). This
    // fixture is that output; the engine must reproduce the TERM stream
    // exactly and the tags at the documented coarse-bucket granularity
    // (NNG=nominal, VV=verbal incl. VA/VX, J=josa, E=eomi, SF=punct —
    // finer nori distinctions need the unavailable dictionary).
    val pynoriFixture = Seq(
      ("업무", "NNG"), ("를", "JKO"),
      ("미루", "VV"), ("지", "EC"),
      ("않", "VX"), ("고", "EC"),
      ("매사", "NNG"), ("에", "JKB"),
      ("최선", "NNG"), ("을", "JKO"),
      ("다하", "VV"), ("는", "ETM"),
      ("모습", "NNG"),
      ("보", "VV"), ("기", "ETN"),
      ("좋", "VA"), ("습니다", "EF"),
      (".", "SF"))
    def bucket(noriTag: String): String = noriTag match {
      case t if t.startsWith("N") => "NNG"
      case t if t.startsWith("V") => "VV"
      case t if t.startsWith("J") => "J"
      case t if t.startsWith("E") => "E"
      case _                      => "SF"
    }
    val sample = "업무를 미루지 않고 매사에 최선을 다하는 모습 보기 좋습니다."
    val toks = Keywords.tokenize(Seq(sample).toDF("text"))
      .select(explode(col("tokens")).as("t"))
      .select("t.term", "t.tag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(toks == pynoriFixture.map { case (term, tag) => (term, bucket(tag)) })
  }

  test("tokenizer generalizes: unseen sentence from the same closed-class lists") {
    val s = spark
    import s.implicits._
    // not the pinned fixture sentence — composed of different words
    // whose particles/endings/stems are in the same public lists, so
    // the analyzer (not memorization of the golden case) must segment
    val toks = Keywords.tokenize(Seq("회사에서 업무를 하고 있습니다.").toDF("text"))
      .select(explode(col("tokens")).as("t"))
      .select("t.term", "t.tag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(toks == Seq(
      ("회사", "NNG"), ("에서", "J"),
      ("업무", "NNG"), ("를", "J"),
      ("하", "VV"), ("고", "E"),
      ("있", "VV"), ("습니다", "E"),
      (".", "SF")))
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
