package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-format surface beyond the default parquet path (SURVEY
  * §2.1 S1/S6/S9): ORC — the second columnar format Spark ships a
  * vectorized reader + predicate pushdown for — and line-oriented
  * text. The reference exchanges everything through parquet tempdirs
  * and gzip JSON (`BkupRs.py:180-181`, `Elastic_indexing.py:160-166`);
  * an engine replacing it must also read the ORC/text corpora a
  * warehouse migration actually encounters.
  *
  * All writers take explicit SaveMode so callers route through
  * [[IdempotentWriter]] semantics when overwriting partitions.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "zstd").orc(path)

  /** Vectorized ORC scan — filters and column pruning push down
    * exactly as with parquet (verified in FormatsSpec).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeText(df: DataFrame, col: String, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.select(col).write.mode(mode).text(path)

  /** One row per line, single `value` column — the raw-corpus entry
    * point for the text-analysis suite (t1-t4 consume exactly this
    * shape after an `AS text` alias).
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Raw-file ingest for the multimodal tier: one row per file with
    * `(path, modificationTime, length, content: binary)` — the entry
    * point that turns a bucket of images/audio into the opaque-binary
    * + typed-metadata shape `multimodal/Multimodal` operates on.
    * `pathGlobFilter` scopes the listing (e.g. `*.jpg`) without a
    * second pass. Metadata-only pipelines should select everything
    * BUT `content`: the binaryFile source prunes the payload read
    * when the column isn't required (FormatsSpec pins this), which at
    * 100 TB is the difference between listing a bucket and reading it.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}
