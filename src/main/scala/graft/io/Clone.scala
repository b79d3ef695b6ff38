package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zero-copy shallow clone of a committed table version (the lakehouse
  * CLONE: a new table whose "data" is a manifest of the source
  * version's files — nothing rewrites, cost is one metadata listing).
  * The dev/test-against-production pattern: clone 100 TB in
  * milliseconds, run the experiment, drop the clone.
  *
  * Contract with the rest of the storage tier:
  *  - the clone pins ONE committed `v=n` of an [[AtomicPublish]]
  *    versioned table; later publishes to the source are invisible to
  *    it (snapshot isolation by construction);
  *  - [[io.Vacuum]] retention on the SOURCE can reap a pinned version
  *    once it ages out — a long-lived clone must [[materialize]]
  *    (rewrite the files under its own root, breaking the dependency)
  *    before the source's retention horizon passes. That ordering is
  *    the operator's one real rule and the spec pins both sides of it.
  *
  * On a real object store the manifest would carry file sizes +
  * etags; here it is the file list plus the pinned (source, version)
  * header — enough to read, audit, and materialize.
  */
object Clone {

  private val ManifestName = "_CLONE"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Create `destTable` as a shallow clone of `srcTable` at version
    * `v` (default: current). Returns the pinned version. Fails if the
    * destination already exists — clones are immutable once cut.
    */
  def shallowClone(spark: SparkSession, srcTable: String, destTable: String,
                   v: Option[Long] = None): Long = {
    val pinned = v.getOrElse(AtomicPublish.currentVersion(spark, srcTable)
      .getOrElse(throw new IllegalStateException(
        s"no committed version under $srcTable")))
    val srcDir = new Path(s"$srcTable/v=$pinned")
    val f = fs(spark, srcDir)
    require(f.exists(new Path(srcDir, "_SUCCESS")),
      s"version $pinned under $srcTable is absent or uncommitted")
    val dest = new Path(destTable)
    require(!f.exists(dest), s"clone destination $destTable already exists")
    val files = f.listStatus(srcDir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(_.toString)
      .sorted
    f.mkdirs(dest)
    val manifest = new Path(dest, ManifestName)
    val out = f.create(manifest, false)
    try out.write(
      (s"src=$srcTable\nversion=$pinned\n" + files.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    pinned
  }

  private def readManifest(spark: SparkSession,
                           destTable: String): (String, Long, Seq[String]) = {
    val manifest = new Path(destTable, ManifestName)
    val f = fs(spark, manifest)
    require(f.exists(manifest), s"$destTable is not a clone (no $ManifestName)")
    val in = f.open(manifest)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val src = lines.head.stripPrefix("src=")
    val ver = lines(1).stripPrefix("version=").toLong
    (src, ver, lines.drop(2))
  }

  /** Read the clone. A materialized clone reads its own files; a
    * shallow one reads the pinned source files through the manifest.
    */
  def readClone(spark: SparkSession, destTable: String): DataFrame = {
    val dataDir = new Path(destTable, "data")
    val f = fs(spark, dataDir)
    if (f.exists(new Path(dataDir, "_SUCCESS")))
      spark.read.parquet(dataDir.toString)
    else {
      val (_, _, files) = readManifest(spark, destTable)
      spark.read.parquet(files: _*)
    }
  }

  /** Break the source dependency: rewrite the pinned data under the
    * clone's own root (this is the moment the clone actually pays for
    * its bytes). Idempotent; after it returns, the source can vacuum
    * the pinned version freely. The manifest stays for lineage.
    */
  def materialize(spark: SparkSession, destTable: String): Unit = {
    val dataDir = new Path(destTable, "data")
    val f = fs(spark, dataDir)
    if (!f.exists(new Path(dataDir, "_SUCCESS")))
      readClone(spark, destTable).write.mode("overwrite")
        .parquet(dataDir.toString)
  }

  /** Is the clone still borrowing the source's files? */
  def isShallow(spark: SparkSession, destTable: String): Boolean =
    !fs(spark, new Path(destTable))
      .exists(new Path(s"$destTable/data/_SUCCESS"))
}
