package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.io.SortedLayout

/** Materialized token tier — the T1-derived-table pattern
  * (`Airflow_week.py:270`, `AWS_GLUE_ETL.py:79-132`: raw loads feed
  * once-computed domain tables that every downstream job reads)
  * applied to the text stack: every k/t/d query re-tokenizes
  * `documents` because oracle queries must stay self-contained, but a
  * production pipeline tokenizes ONCE and serves all of them from
  * this store.
  *
  * Layout: range-sorted on `term` ([[SortedLayout.writeRangeSorted]])
  * so per-file min/max stats prune term-filtered reads (the BM25 tf
  * lookup, postings fetches) down to single files — at 100 TB the
  * token tier is bigger than the corpus, so its layout matters more.
  */
object TokenStore {

  /** Same normalization as `Keywords`/`SearchDsl` (lower, trim,
    * whitespace-collapse, split). */
  val tokens: (SparkSession, String) => DataFrame = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        posexplode(expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
          .as(Seq("pos", "term")))

  def materialize(spark: SparkSession, dir: String, path: String,
                  numFiles: Int = 8): Unit =
    SortedLayout.writeRangeSorted(tokens(spark, dir), path, numFiles, col("term"))

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** k1's top-keywords computed from the store instead of re-tokenizing
    * — identical output, tokenize cost paid once at materialize time.
    */
  def topKeywordsFromStore(spark: SparkSession, path: String): DataFrame = {
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    val toks = load(spark, path)
      .filter(!col("term").isin(stop: _*))
      .select("doc_id", "term")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("term").as("keyword"), col("tf"), col("df"),
        col("rank").as("kywr_rank"))
  }
}
