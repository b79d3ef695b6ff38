package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two semantics the v1 oracle depends on but cannot isolate:
  * greedy left-to-right merge application and the sentinel-padding
  * boundary guard.
  */
class BpeSpec extends SparkSpec {

  private def vocab(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("word", "n").withColumn("sym",
      concat(lit(" "), trim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" ")))
  }

  test("merge application is greedy left-to-right, non-overlapping") {
    // 'aaa' with winning pair (a,a): greedy BPE yields [aa, a], never
    // [a, aa] — the literal replace must consume ' a a ' including the
    // trailing space so the scan resumes after it
    val (tops, vFinal) = Bpe.learnMerges(vocab(("aaa", 10L)))
    try {
      val first = tops.head.collect().head
      assert(first.getString(0) == "a" && first.getString(1) == "a")
      val sym = vFinal.filter(col("word") === "aaa")
        .select("sym").collect().head.getString(0)
      // round 1: ' a a a ' -> ' aa a '; round 2 merges (aa, a);
      // round 3 has nothing left to pair on this word
      assert(sym == " aaa ", s"got '$sym'")
    } finally graft.core.Caching.releaseAll()
  }

  test("round trip: segmentation never loses or invents characters") {
    // the BPE invariant the encode side rests on: for EVERY vocab word
    // after all merge rounds, deleting the segment separators from
    // `sym` reconstructs the original word exactly — merges re-group
    // characters but cannot drop, duplicate, or leak them across the
    // sentinel padding. Run against the real sf0.001 corpus vocab so
    // the property covers real merge collisions, not toy fixtures.
    val s = spark
    import s.implicits._
    val v0 = graft.core.Tables.loadParallel(s, "/root/testdata/sf0.001", "documents")
      .select(explode(expr(
        "split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym",
        concat(lit(" "), trim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" ")))
    val (_, vFinal) = Bpe.learnMerges(v0)
    try {
      val broken = vFinal
        .withColumn("rebuilt", regexp_replace(trim(col("sym")), " ", ""))
        .filter(col("rebuilt") =!= col("word"))
        .select("word", "sym").collect()
      assert(broken.isEmpty,
        broken.take(5).map(r => s"'${r.getString(0)}' -> '${r.getString(1)}'")
          .mkString("; "))
      // and every word segments into >= 1 non-empty piece
      val empties = vFinal.filter(length(trim(col("sym"))) === 0).count()
      assert(empties === 0)
    } finally graft.core.Caching.releaseAll()
  }

  test("padding keeps a merged symbol from matching inside a neighbor") {
    // winner is (t,e) from 'tete'(5)+'te'(4) = 14 adjacent occurrences
    // -- wait: craft so round-1 winner is (e,s) and verify ' e s ' does
    // NOT rewrite the 'e st' inside ' t e st ' once 'st' is one symbol.
    // Simpler deterministic pin: learn on {'es' x 9, 'test' x 1}.
    // Round 1 winner (e,s) cnt=10; applying to ' t e s t ' IS correct
    // (its e s are still single chars). Round 2 winner must then NOT
    // find ' e s ' anywhere: 'es' is fully merged, 'test' is ' t es t '.
    val (tops, _) = Bpe.learnMerges(vocab(("es", 9L), ("test", 1L)))
    try {
      val r1 = tops(0).collect().head
      assert(r1.getString(0) == "e" && r1.getString(1) == "s" && r1.getLong(2) == 10L)
      val r2 = tops(1).collect().head
      // remaining pairs come only from ' t es t ': (t,es) and (es,t),
      // tie on cnt=1 broken lexicographically -> (es,t)
      assert(r2.getString(0) == "es" && r2.getString(1) == "t" && r2.getLong(2) == 1L,
        s"got ${r2.mkString(",")}")
    } finally graft.core.Caching.releaseAll()
  }
}
