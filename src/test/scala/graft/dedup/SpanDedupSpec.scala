package graft.dedup

import graft.SparkSpec

/** d17 winnowing span dedup — pins the `SpanDfCap` saturation contract
  * (r5 verdict #5): a fingerprint shared by MORE than `SpanDfCap` (64)
  * documents is dropped *entirely* before the pair join. Saturation
  * therefore degrades recall on boilerplate spans (which are
  * dedup-useless anyway) but can never blow up the join: per-fingerprint
  * fan-out is hard-bounded at C(64,2) pairs no matter how viral a span
  * becomes at 100 TB.
  */
class SpanDedupSpec extends SparkSpec {

  // A 20-token span: ≥ W+K-1 = 13 tokens, so the winnowing guarantee
  // says two docs sharing it verbatim MUST surface a common fingerprint.
  private def span(tag: String): String =
    (1 to 20).map(i => s"${tag}tok$i").mkString(" ")

  private def corpus(dir: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // The cap is per-FINGERPRINT, not per-span: docs sharing a span but
    // with distinct surrounding text keep sub-cap boundary fingerprints
    // even when the span itself is viral. So saturation is pinned with
    // IDENTICAL documents, where every fingerprint carries the full df:
    // group X: 65 verbatim copies (cap+1) — every fingerprint df=65 > 64,
    //   all evicted. Expected pairs: NONE.
    // group Y: exactly 64 verbatim copies (the cap, inclusive) — all
    //   fingerprints kept; expect all C(64,2) pairs.
    // group Z: 2 docs share spanZ behind unique prefixes — the plain
    //   positive case (winnowing guarantee across differing contexts).
    val rows =
      (1 to 65).map(i => Row(100L + i, span("x"))) ++
      (1 to 64).map(i => Row(300L + i, span("y"))) ++
      Seq(Row(501L, s"uz1a uz1b uz1c ${span("z")}"),
          Row(502L, s"uz2a uz2b uz2c ${span("z")}"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("d17: fingerprints past SpanDfCap are evicted; fan-out stays ≤ C(cap,2)") {
    val dir = tmpDir("span-dedup")
    corpus(dir)
    val pairs = Dedup.d17SpanDedup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val groupX = pairs.filter { case (a, b) => a <= 200 && b <= 200 }
    assert(groupX.isEmpty,
      s"cap+1 group must produce NO pairs (fingerprint evicted), got ${groupX.size}")

    val groupY = pairs.filter { case (a, b) => a >= 300 && a <= 400 && b <= 400 }
    assert(groupY.size == 64 * 63 / 2,
      s"cap-boundary group (df == cap) must keep ALL C(64,2) pairs, got ${groupY.size}")

    assert(pairs.contains((501L, 502L)), "plain 2-doc shared span must pair")

    // nothing pairs ACROSS groups (distinct spans share no fingerprint)
    val cross = pairs.filter { case (a, b) =>
      (a <= 200) != (b <= 200) || (a >= 500) != (b >= 500) }
    assert(cross.isEmpty, s"cross-group pairs: $cross")
  }
}
