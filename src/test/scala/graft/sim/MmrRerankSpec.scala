package graft.sim

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r14 collapse of s15's greedy MMR (one grouped collect +
  * array expressions) against the ORIGINAL unrolled three-step join
  * form, run here over the SAME candidate frame — pair grid, anti-join
  * remainder, max-redundancy aggregate, rank-1 window per step. The
  * DuckDB oracle re-proves the same equivalence cross-engine on every
  * driver run; this spec keeps it pinned in-repo at test speed.
  */
class MmrRerankSpec extends SparkSpec {

  test("collapsed MMR aggregate == unrolled three-step join reference") {
    val got = graft.queries.Registry.queries("s15_mmr_rerank")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet

    val cands = Similarity.s15Cands(spark, sfDir).cache()
    val pairs = cands.as("a")
      .join(cands.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.vec_id").as("cand"), col("b.vec_id").as("other"),
        expr("cast(round(1e6 * (cast(long_array_dot(a.qv, b.qv) as double)" +
          " / sqrt(cast(a.n2 as double) * cast(b.n2 as double)))) as bigint)")
          .as("simp"))
      .cache()
    val slim = cands.select("query_id", "vec_id", "simq")
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("simq").desc, col("vec_id"))
    var selected = slim
      .withColumn("r", row_number().over(w1))
      .filter(col("r") === 1)
      .select(col("query_id"), col("vec_id"), lit(1).as("mmr_rank"),
        (col("simq") * 7).as("mmr_score"))
    for (step <- 2 to 3) {
      val remaining = slim.join(selected.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_anti")
      val redundancy = pairs
        .join(selected.select(col("query_id"), col("vec_id").as("other")),
          Seq("query_id", "other"))
        .groupBy(col("query_id"), col("cand").as("vec_id"))
        .agg(max("simp").as("red"))
      val wS = Window.partitionBy("query_id")
        .orderBy(col("mmr_score").desc, col("vec_id"))
      val pick = remaining.join(redundancy, Seq("query_id", "vec_id"))
        .withColumn("mmr_score", col("simq") * 7 - col("red") * 3)
        .withColumn("r", row_number().over(wS))
        .filter(col("r") === 1)
        .select(col("query_id"), col("vec_id"), lit(step).as("mmr_rank"),
          col("mmr_score"))
      selected = selected.unionByName(pick)
    }
    val ref = selected.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    cands.unpersist(); pairs.unpersist()
    graft.core.Caching.releaseAll()

    assert(got == ref)
    assert(got.nonEmpty)
  }

  test("groups with <3 candidates emit only the picks they have (ANSI-safe)") {
    // The production candidate generator always yields 10 per query;
    // this pins the degenerate path the r15 advice flagged: under
    // ANSI mode (Spark 4 default) the old `array_sort(...)[0]` THREW
    // on an empty remainder array instead of reaching the null-filter.
    val s = spark
    import s.implicits._
    val cands = Seq(
      // query 1: two candidates — sel3's remainder is EMPTY
      (1L, 10L, 900000L, Array(1L, 0L), 1L),
      (1L, 11L, 800000L, Array(0L, 1L), 1L),
      // query 2: one candidate — sel2 and sel3 both run dry
      (2L, 20L, 700000L, Array(1L, 1L), 2L))
      .toDF("query_id", "vec_id", "simq", "qv", "n2")
    val got = Similarity.s15MmrSelect(cands)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // query 1 emits exactly ranks 1-2, query 2 exactly rank 1 — no
    // crash, no null picks
    assert(got.map(t => (t._1, t._3)) == Set((1L, 1), (1L, 2), (2L, 1)))
    assert(got.filter(_._1 == 1L).map(_._2) == Set(10L, 11L))
    assert(got.filter(_._1 == 2L).map(_._2) == Set(20L))
  }
}
