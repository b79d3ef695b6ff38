package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the corpus-mix operators (the DuckDB oracle
  * checks exact values; these check the properties that make the
  * operators correct *as pipeline stages*).
  */
class CorpusSpec extends SparkSpec {

  test("c1: split is exhaustive, deterministic, and roughly 90/5/5") {
    val split = Corpus.c1HashSplit(spark, sfDir)
    val total = split.count()
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == total)
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // md5 buckets: train share must be in a loose 90±6% band even on
    // the tiny test corpus
    val trainFrac = byName.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.84 && trainFrac < 0.96, s"train frac $trainFrac")
    // re-run gives the identical assignment (no rand/seed dependence)
    val again = Corpus.c1HashSplit(spark, sfDir)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("c2: every doc appears exactly `weight` times with epochs 1..weight") {
    val mix = Corpus.c2CorpusMix(spark, sfDir)
    val perDoc = mix.groupBy("doc_id", "weight")
      .agg(count(lit(1)).as("copies"), max("epoch").as("max_epoch"),
        min("epoch").as("min_epoch"))
    assert(perDoc.filter(
      col("copies") =!= col("weight") || col("max_epoch") =!= col("weight") ||
      col("min_epoch") =!= 1).isEmpty)
    // weights span the 1..3 tiers
    val ws = mix.select("weight").distinct().collect().map(_.getInt(0)).sorted
    assert(ws.sameElements(Array(1, 2, 3)))
  }

  test("c2: malformed and negative sources floor at weight 1, never error") {
    val s = spark
    import s.implicits._
    val odd = Seq("src1", "src2", "src0", "web-01", "garbage", "s", "")
      .toDF("source")
      .withColumn("weight", expr(Corpus.weightExpr))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(odd("src1") == 2 && odd("src2") == 3 && odd("src0") == 1)
    // 'web-01' parses substr 4.. as -1: floored to 1 (not Spark's
    // descending sequence(1,0)); unparseable/short/empty sources -> 1
    assert(odd("web-01") == 1 && odd("garbage") == 1 &&
      odd("s") == 1 && odd("") == 1)
  }

  test("c3: flagged docs are train-split only and really share shingles") {
    val flagged = Corpus.c3Decontaminate(spark, sfDir)
    val split = Corpus.c1HashSplit(spark, sfDir)
      .select(col("doc_id").as("train_doc"), col("split"))
    // every flagged doc is in the train split
    assert(flagged.join(split, "train_doc")
      .filter(col("split") =!= "train").isEmpty)
    // counts respect the threshold
    assert(flagged.filter(col("n_shared_shingles") < 2 ||
      col("n_eval_docs") < 1).isEmpty)
  }

  test("c4: gate keeps at least half of every language, never below-median") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val kept = Corpus.c4QualityGate(spark, sfDir)
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allBy = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allBy.foreach { case (lang, n) =>
      val k = keptBy.getOrElse(lang, 0L)
      assert(k * 2 >= n - 1, s"$lang kept $k of $n")   // >= half (median def)
      assert(k < n, s"$lang gate dropped nothing")     // gate actually gates
    }
    assert(kept.filter(col("n_tokens") < col("lang_median")).isEmpty)
  }

  test("c6: packing is gapless per shard — offsets chain by token count " +
       "and every context window is referenced contiguously") {
    val s = spark
    import org.apache.spark.sql.expressions.Window
    val packed = graft.queries.Registry.queries("c6_sequence_packing")(s, sfDir)
    // within a shard, next doc's global position = prev position + tokens
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val chained = packed
      .withColumn("pos", col("seq_id") * 2048 + col("offset"))
      .withColumn("next_pos", lead(col("pos"), 1).over(w))
      .withColumn("expected_next", col("pos") + col("n_tokens"))
      .filter(col("next_pos").isNotNull &&
        col("next_pos") =!= col("expected_next"))
    assert(chained.count() == 0, "token stream has gaps or overlaps")
    // seq ids per shard are contiguous from 0
    val seqs = packed.groupBy("shard")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        countDistinct("seq_id").as("n"))
      .filter(col("lo") =!= 0L || col("n") =!= col("hi") - col("lo") + 1)
    assert(seqs.count() == 0, "sequence ids are not contiguous per shard")
  }

  test("c7: temperature weights flatten the mix — small sources gain " +
       "share, large sources lose it, shares sum to ~1e6") {
    val s = spark
    val mix = graft.queries.Registry.queries("c7_temperature_mix")(s, sfDir)
      .collect().map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("share_micro")))
    val totDocs = mix.map(_._1).sum.toDouble
    for ((n, share) <- mix) {
      val rawShare = n / totDocs * 1e6
      if (n / totDocs < 1.0 / mix.length) assert(share >= rawShare.toLong,
        s"small source lost share: n=$n share=$share raw=$rawShare")
      else if (n / totDocs > 1.0 / mix.length) assert(share <= rawShare.toLong + 1,
        s"large source gained share: n=$n share=$share raw=$rawShare")
    }
    val sumShare = mix.map(_._2).sum
    assert(math.abs(sumShare - 1000000L) <= mix.length,
      s"shares should sum to ~1e6, got $sumShare")
  }

  test("c5: exactly min(k, |stratum|) docs per source, stable across runs") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val sample = Corpus.c5StratifiedSample(spark, sfDir).cache()
    val per = sample.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    avail.foreach { case (src, n) =>
      assert(per.getOrElse(src, 0L) == math.min(50L, n), s"$src: ${per.get(src)}")
    }
    // deterministic: a second evaluation returns the identical sample
    val again = Corpus.c5StratifiedSample(spark, sfDir)
    assert(sample.exceptAll(again).isEmpty && again.exceptAll(sample).isEmpty)
    sample.unpersist(): Unit
  }

  test("c16: best-fit packing is exhaustive, within budget, near-optimal, " +
       "and deterministic") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val packed = Corpus.c16BestfitPack(spark, sfDir).cache()
    // every document packed exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    val ctx = 2048L
    // per-bin budget: a bin either holds docs summing <= ctx, or is a
    // single overlong document (the truncation case)
    val bins = packed.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
    val over = bins.filter(col("tok") > ctx && col("n") > 1).count()
    assert(over == 0, s"$over multi-doc bins exceed the context budget")
    // BFD bound per shard: bins <= 11/9 * ceil(total/ctx) + 1 (+ overlong)
    val byShard = packed.groupBy("shard")
      .agg(sum("n_tokens").as("tot"),
        countDistinct("bin_id").as("nbins"),
        sum(when(col("n_tokens") >= ctx, 1L).otherwise(0L)).as("overlong"))
      .collect()
    byShard.foreach { r =>
      val lb = math.ceil(r.getAs[Long]("tot").toDouble / ctx)
      val allowed = math.ceil(11.0 / 9.0 * lb) + 1 + r.getAs[Long]("overlong")
      assert(r.getAs[Long]("nbins") <= allowed,
        s"shard ${r.getAs[Long]("shard")}: ${r.getAs[Long]("nbins")} bins > $allowed allowed")
    }
    // deterministic re-run
    val again = Corpus.c16BestfitPack(spark, sfDir)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
    packed.unpersist(): Unit
  }

  test("c20: epoch orders are decorrelated (|rho| within 3 sigma of the null)") {
    val rows = Corpus.c20EpochShuffle(spark, sfDir).collect()
    assert(rows.length === 3) // epoch pairs (1,2) (1,3) (2,3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val rho = r.getAs[Long]("rho_micro")
      // null stderr of Spearman rho is 1/sqrt(n-1)
      val limit = (3.0 / math.sqrt((n - 1).toDouble) * 1e6).toLong
      assert(math.abs(rho) < limit,
        s"epochs (${r.getAs[Long]("e1")},${r.getAs[Long]("e2")}): rho=$rho micro exceeds $limit")
    }
  }
}
