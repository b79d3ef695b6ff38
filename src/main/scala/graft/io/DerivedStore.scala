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
  *  - PUBLICATION: versioned. Each build lands in its own `v<N>`
  *    directory (staged via temp dir + `ATOMIC_MOVE`), then the
  *    `_current` pointer file is replaced atomically (the
  *    SchemaRegistry commit discipline) — a concurrent reader
  *    resolves the pointer to a COMPLETE version dir; there is no
  *    window where the store is half-written or absent (a plain
  *    delete-then-move swap has exactly that window). Superseded
  *    versions are swept one publish LATER, so a reader that
  *    resolved v(N-1) just before v(N) committed keeps its files for
  *    a full refresh cycle. A process losing the pointer race falls
  *    back to the winner's (complete) version.
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

  /** Pointer file: first line `v<N>`, second line the fingerprint. */
  private[io] def currentPath(store: Path): Path = store.resolve("_current")

  private def readCurrent(store: Path): Option[(Int, String)] = {
    val c = currentPath(store)
    if (!Files.exists(c)) None
    else new String(Files.readAllBytes(c), StandardCharsets.UTF_8)
      .split("\n", 2) match {
        case Array(v, fp) if v.startsWith("v") =>
          v.drop(1).toIntOption.map(n => (n, fp))
        case _ => None
      }
  }

  /** Serve `name` for `dir`: resolve the `_current` pointer to a
    * complete version dir, publishing a new version first if the
    * pointer is absent or its fingerprint is stale. Builds are
    * in-JVM-serialized. */
  def served(s: SparkSession, dir: String, name: String,
             sources: Seq[String],
             build: (SparkSession, String) => DataFrame,
             numFiles: Int, sortKey: String): DataFrame = {
    val store = storePath(dir, name)
    val fp = fingerprint(dir, sources)
    def fresh = readCurrent(store).filter(_._2 == fp)
    val version = fresh.getOrElse {
      lock.synchronized {
        fresh.getOrElse { // recheck under the lock
          val prev = readCurrent(store)
          val n = prev.map(_._1).getOrElse(0) + 1
          val tmp = store.resolve(
            s".v$n.tmp-${ProcessHandle.current.pid}-${nonce.incrementAndGet()}")
          Files.createDirectories(store)
          SortedLayout.writeRangeSorted(build(s, dir), tmp.toString, numFiles, col(sortKey))
          try Files.move(tmp, store.resolve(s"v$n"), StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileSystemException => deleteRecursively(tmp) }
          val ptmp = store.resolve(s"._current.tmp-${ProcessHandle.current.pid}")
          Files.write(ptmp, s"v$n\n$fp".getBytes(StandardCharsets.UTF_8))
          Files.move(ptmp, currentPath(store),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          // sweep versions superseded BEFORE this publish: a reader
          // that resolved v(n-1) moments ago keeps its files until
          // the NEXT refresh cycle
          val it = Files.list(store)
          try it.forEach { d =>
            val dn = d.getFileName.toString
            if (dn.startsWith("v") && dn.drop(1).toIntOption.exists(_ < n - 1))
              deleteRecursively(d)
          } finally it.close()
          (n, fp)
        }
      }
    }
    s.read.parquet(store.resolve(s"v${version._1}").toString)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val it = Files.walk(p)
      try it.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f): Unit })
      finally it.close()
    }
}
