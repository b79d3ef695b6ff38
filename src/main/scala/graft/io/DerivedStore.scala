package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The build-once / serve-many tier machinery shared by every
  * materialized derived table ([[GraphStore]]'s edge tiers,
  * `dedup.ClusterStore`'s component labels, `dedup.BandIndexStore`'s
  * standing band index): fingerprint-keyed freshness + atomic
  * versioned publication, entirely on the Hadoop `FileSystem` API so
  * the tier deploys wherever the data lives (HDFS, object stores via
  * their Hadoop connectors, local FS in tests — the same portability
  * contract as [[AtomicPublish]]/[[Vacuum]]/[[Backup]]).
  *
  *  - FRESHNESS: a store records the (size, mtime) of every source
  *    table it derives from and rebuilds when any drifts — the
  *    incremental-refresh contract (a new corpus snapshot invalidates
  *    exactly the tiers derived from the tables that changed, nothing
  *    else rebuilds). The fingerprint travels INSIDE each committed
  *    version (`v=n/_fingerprint`, written into the staging dir before
  *    the commit rename), so data and the fingerprint that describes
  *    it are one atomic unit — there is no pointer file that can
  *    advertise a fingerprint for data that failed to land.
  *  - PUBLICATION: [[AtomicPublish]]'s versioned OCC protocol, not a
  *    private re-implementation. Each build stages under a dot-prefixed
  *    tx dir ([[AtomicPublish.stageVersionWith]]) — invisible to
  *    readers — then races for the next `v=n` via the one O(1) commit
  *    rename ([[AtomicPublish.commitStagedOcc]]). `_SUCCESS` is the
  *    commit record; readers resolve the highest COMMITTED version
  *    ([[AtomicPublish.currentVersion]]), so a concurrent reader always
  *    sees a complete version and a crashed build orphans bytes without
  *    ever corrupting the store. Two processes publishing concurrently
  *    both commit (serialized by version number); each version carries
  *    the fingerprint of the sources ITS build read, so the highest
  *    committed version is always self-consistent — a lost race can
  *    never advertise one build's fingerprint over another's data.
  *  - GC: [[Vacuum.sweep]] with `keepVersions = 2` — the superseded
  *    version survives exactly one refresh cycle (grace for a reader
  *    that resolved it just before the publish), and in-flight
  *    uncommitted staging is protected by Vacuum's mtime grace.
  *  - LAYOUT: range-sorted on the tier's serve key
  *    ([[SortedLayout.writeRangeSorted]]) so per-file min/max stats
  *    prune keyed lookups; `numFiles` is the parallelism knob.
  */
object DerivedStore {

  private def root: String =
    sys.props.get("graft.graphstore.dir")
      .orElse(sys.env.get("GRAFT_GRAPHSTORE_DIR"))
      .getOrElse("spark-warehouse/graphstore")

  /** In-JVM build serialization (the common single-process case:
    * concurrent consumers of a stale tier build it once). Cross-process
    * publication needs no lock — the OCC commit rename arbitrates. */
  private val lock = new Object

  private val FingerprintFile = "_fingerprint"

  private def hadoopFs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (size, mtime) fingerprint of the source tables a store derives
    * from — drift in any source invalidates exactly this store. */
  private def fingerprint(s: SparkSession, dir: String,
                          sources: Seq[String]): String =
    sources.map { t =>
      val p = new Path(dir, s"$t.parquet")
      val fs = hadoopFs(s, p)
      val (sz, mt) =
        if (!fs.exists(p)) (0L, 0L)
        else {
          val st = fs.getFileStatus(p)
          if (st.isDirectory) {
            val children = fs.listStatus(p)
            (children.map(_.getLen).sum,
             children.foldLeft(0L)((m, c) => math.max(m, c.getModificationTime)))
          } else (st.getLen, st.getModificationTime)
        }
      s"$t:$sz:$mt"
    }.mkString(";")

  /** Where a tier lives on disk — the introspection surface specs and
    * tooling (ScanCount's tier mapping, Vacuum runs) key off. */
  def storePath(dir: String, name: String): String =
    s"$root/${dir.replace('/', '_').stripPrefix("_")}/$name"

  /** Fingerprint a committed version was built from, if recorded. */
  private def versionFingerprint(s: SparkSession, store: String,
                                 v: Long): Option[String] = {
    val p = new Path(s"$store/v=$v", FingerprintFile)
    val fs = hadoopFs(s, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Serve `name` for `dir`: resolve the highest committed `v=n` whose
    * recorded fingerprint matches the sources' current state,
    * publishing a new version first if the store is absent or stale.
    * Builds are in-JVM-serialized; cross-process racers serialize on
    * the OCC commit. */
  def served(s: SparkSession, dir: String, name: String,
             sources: Seq[String],
             build: (SparkSession, String) => DataFrame,
             numFiles: Int, sortKey: String): DataFrame = {
    val store = storePath(dir, name)
    val fp = fingerprint(s, dir, sources)
    def fresh: Option[Long] = AtomicPublish.currentVersion(s, store)
      .filter(v => versionFingerprint(s, store, v).contains(fp))
    val version = fresh.getOrElse {
      lock.synchronized {
        fresh.getOrElse { // recheck under the lock
          val staging = AtomicPublish.stageVersionWith(store) { p =>
            SortedLayout.writeRangeSorted(build(s, dir), p, numFiles, col(sortKey))
          }
          // the fingerprint rides inside the staged version so the
          // commit rename publishes data + provenance atomically
          val fs = hadoopFs(s, staging)
          val out = fs.create(new Path(staging, FingerprintFile), true)
          try out.write(fp.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          val n = AtomicPublish.commitStagedOcc(s, store, staging)
          // superseded versions survive ONE refresh cycle: a reader
          // that resolved v(n-1) moments ago keeps its files until
          // the NEXT publish (Vacuum's keep-window, shared GC)
          Vacuum.sweep(s, store, keepVersions = 2): Unit
          n
        }
      }
    }
    s.read.parquet(s"$store/v=$version")
  }
}
