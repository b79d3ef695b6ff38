package graft.io

import org.apache.spark.sql.DataFrame

/** K2/K3 — export sinks.
  *
  *  - K2: the reference UNLOADs query results as a **single gzip JSON**
  *    object (`parallel OFF gzip allowoverwrite`,
  *    `Elastic_indexing.py:160-166`) → `coalesce(1)` + gzip JSON.
  *    `coalesce(1)` is correct here because single-file output is the
  *    contract; anything bigger should use [[batchedJson]].
  *  - K3: the bulk-index sink flushes every 300,000 docs
  *    (`Elastic_indexing.py:219-223`) → `maxRecordsPerFile`, which
  *    bounds batch size without a repartition shuffle.
  */
object Export {

  def singleGzipJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").json(path)

  def batchedJson(df: DataFrame, path: String,
                  maxRecordsPerFile: Long = 300000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .json(path)
}
