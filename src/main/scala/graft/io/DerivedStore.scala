package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The build-once / serve-many tier machinery shared by every
  * materialized derived table ([[GraphStore]]'s edge tiers,
  * `dedup.ClusterStore`'s component labels, `text.TokenStore`-style
  * artifacts): fingerprint-keyed freshness + atomic publication.
  *
  *  - FRESHNESS: a store records the (size, mtime) of every source
  *    table it derives from and rebuilds when any drifts — the
  *    incremental-refresh contract (a new corpus snapshot invalidates
  *    exactly the tiers derived from the tables that changed, nothing
  *    else rebuilds).
  *  - PUBLICATION: build into a temp dir, `ATOMIC_MOVE` into place
  *    (the SchemaRegistry commit discipline) — a concurrent reader
  *    sees the old complete store or the new complete store, never a
  *    half-written directory. A process losing the move race falls
  *    back to the winner's (complete) store.
  *  - LAYOUT: range-sorted on the tier's serve key
  *    ([[SortedLayout.writeRangeSorted]]) so per-file min/max stats
  *    prune keyed lookups; `numFiles` is the parallelism knob.
  */
object DerivedStore {

  private def root: String =
    sys.props.get("graft.graphstore.dir")
      .orElse(sys.env.get("GRAFT_GRAPHSTORE_DIR"))
      .getOrElse("spark-warehouse/graphstore")

  private val lock = new Object
  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** (size, mtime) fingerprint of the source tables a store derives
    * from — drift in any source invalidates exactly this store. */
  private def fingerprint(dir: String, sources: Seq[String]): String =
    sources.map { t =>
      val p = Paths.get(dir, s"$t.parquet")
      val (sz, mt) =
        if (Files.isDirectory(p)) {
          val it = Files.list(p)
          try {
            val fs = it.iterator()
            var s = 0L; var m = 0L
            while (fs.hasNext) {
              val f = fs.next()
              s += Files.size(f); m = math.max(m, Files.getLastModifiedTime(f).toMillis)
            }
            (s, m)
          } finally it.close()
        } else if (Files.exists(p)) (Files.size(p), Files.getLastModifiedTime(p).toMillis)
        else (0L, 0L)
      s"$t:$sz:$mt"
    }.mkString(";")

  private def storePath(dir: String, name: String): Path =
    Paths.get(root, dir.replace('/', '_').stripPrefix("_"), name)

  private def metaPath(store: Path): Path = store.resolve("_graft_store_meta")

  private def isFresh(store: Path, fp: String): Boolean =
    Files.exists(metaPath(store)) &&
      new String(Files.readAllBytes(metaPath(store)), StandardCharsets.UTF_8) == fp

  /** Serve `name` for `dir`: read the materialized tier, building it
    * first if absent or stale. Builds are in-JVM-serialized. */
  def served(s: SparkSession, dir: String, name: String,
             sources: Seq[String],
             build: (SparkSession, String) => DataFrame,
             numFiles: Int, sortKey: String): DataFrame = {
    val store = storePath(dir, name)
    val fp = fingerprint(dir, sources)
    if (!isFresh(store, fp)) lock.synchronized {
      if (!isFresh(store, fp)) { // recheck under the lock
        val tmp = store.getParent.resolve(
          s".${name}.tmp-${ProcessHandle.current.pid}-${nonce.incrementAndGet()}")
        Files.createDirectories(store.getParent)
        SortedLayout.writeRangeSorted(build(s, dir), tmp.toString, numFiles, col(sortKey))
        Files.write(metaPath(tmp), fp.getBytes(StandardCharsets.UTF_8))
        deleteRecursively(store)
        try Files.move(tmp, store, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException =>
          // another process published first; its store is complete
          deleteRecursively(tmp)
        }
      }
    }
    s.read.parquet(store.toString)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val it = Files.walk(p)
      try it.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f): Unit })
      finally it.close()
    }
}
