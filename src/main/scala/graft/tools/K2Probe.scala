package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the k2 singleton-prune strategies at a given SF. */
object K2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }

    // current: window-count prune
    time("window") { graft.text.Keywords.k2TfCosinePairs(spark, sfDir).count() }

    // variant: groupBy df + join prune
    time("groupby") {
      val docs = graft.core.Tables.loadParallel(spark, sfDir, "documents")
      val toks = docs.select(col("doc_id"), col("source"),
        explode(expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')")).as("term"))
      val tf = toks.groupBy("source", "doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist()
      tf.count()
      val norms = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
      val multi = tf.groupBy("source", "term").agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") >= 2).select("source", "term")
      val shared = tf.join(multi, Seq("source", "term"))
        .select("source", "doc_id", "term", "tf")
      val dots = shared.as("x")
        .join(shared.as("y"),
          col("x.source") === col("y.source") && col("x.term") === col("y.term") &&
          col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(sum(col("x.tf") * col("y.tf")).as("dot"))
      val out = dots
        .join(norms.as("na"), col("doc_a") === col("na.doc_id"))
        .join(norms.as("nb"), col("doc_b") === col("nb.doc_id"))
        .withColumn("cos_sim",
          col("dot").cast("double") / sqrt(col("na.n2").cast("double") * col("nb.n2").cast("double")))
        .filter(col("cos_sim") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("cos_sim"))
      val n = out.count()
      tf.unpersist()
      n
    }
    spark.stop()
  }
}
