package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural contracts for the r7 sketch/join batch (q96-q98) that
  * the DuckDB hash gate can't express: salted ≡ unsalted in-engine,
  * the HDR error bound, and KMV set-op estimation quality.
  */
class SketchQuerySpec extends SparkSpec {

  test("q96: salted join result is row-identical to the plain unsalted join") {
    val salted = graft.queries.Relational.q96SaltedJoin(spark, sfDir)
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("rev_cents"))
    val supp = graft.core.Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val plain = li.join(supp, "s_suppkey")
      .groupBy("s_nationkey")
      .agg(sum("rev_cents").as("rev_cents"), count(lit(1)).as("n_items"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q97: histogram quantile underestimates by construction, never by more than 10%") {
    val r = HdrHist.q97HdrQuantiles(spark, sfDir).head()
    for (p <- Seq("p50", "p90", "p99")) {
      val est = r.getAs[Long](s"est_$p")
      val exact = r.getAs[Long](s"exact_$p")
      val err = r.getAs[Long](s"err_bp_$p")
      assert(est <= exact, s"$p: lower bound must not exceed the exact value")
      assert(err >= 0 && err < 1000,
        s"$p: two-significant-digit bucket bound violated (err=$err bp)")
    }
  }

  test("q98: KMV union/intersection estimates land within the k=64 error regime") {
    val r = KMV.q98KmvSetops(spark, sfDir).head()
    val exactU = r.getAs[Long]("exact_union").toDouble
    val exactI = r.getAs[Long]("exact_intersect").toDouble
    val estU = r.getAs[Double]("union_est")
    val estI = r.getAs[Double]("intersect_est")
    // KMV stderr ~ 1/sqrt(k-2) ≈ 13%; assert a loose 3-sigma band for
    // the union and a union-scaled absolute band for the intersection
    // (its rho estimator adds binomial noise on top)
    assert(math.abs(estU - exactU) <= 0.4 * exactU,
      s"union: est=$estU exact=$exactU")
    assert(math.abs(estI - exactI) <= 0.5 * exactU,
      s"intersect: est=$estI exact=$exactI (union=$exactU)")
  }

  test("q98: fully-degenerate board (BOTH audiences absent) reads 0.0, never NaN") {
    // an events table with no view/purchase rows at all: m = 0, and
    // intersect_est = both·union/m must short-circuit to 0.0 (the r7
    // advice NaN/NULL divergence)
    val dir = tmpDir("q98-degenerate")
    graft.core.Tables.load(spark, sfDir, "events")
      .filter(!org.apache.spark.sql.functions.col("event_type")
        .isin("view", "purchase"))
      .write.parquet(s"$dir/events.parquet")
    val r = KMV.q98KmvSetops(spark, dir).head()
    assert(r.getAs[Long]("exact_union") == 0L)
    assert(r.getAs[Double]("union_est") == 0.0)
    assert(r.getAs[Double]("intersect_est") == 0.0,
      s"degenerate intersect_est must be 0.0, got ${r.getAs[Double]("intersect_est")}")
  }
}
