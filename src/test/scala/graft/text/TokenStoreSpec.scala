package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenStoreSpec extends SparkSpec {

  test("store-served top keywords equal the recompute-from-documents path") {
    val path = tmpDir("tokstore") + "/tokens"
    TokenStore.materialize(spark, sfDir, path)
    val fromStore = TokenStore.topKeywordsFromStore(spark, path)
    val direct = Keywords.k1TopKeywords(spark, sfDir)
    assert(fromStore.exceptAll(direct).isEmpty && direct.exceptAll(fromStore).isEmpty)
  }

  test("term-filtered store reads touch few files (range-sorted term layout)") {
    val path = tmpDir("tokstore-prune") + "/tokens"
    TokenStore.materialize(spark, sfDir, path, numFiles = 6)
    val back = TokenStore.load(spark, path)
    val someTerm = back.select("term").head().getString(0)
    val touched = back.filter(col("term") === someTerm)
      .select(input_file_name()).distinct().count()
    assert(touched <= 2, s"term lookup touched $touched files")
    // the store preserves every token occurrence (posexplode keeps dups)
    assert(back.count() == TokenStore.tokens(spark, sfDir).count())
  }
}
