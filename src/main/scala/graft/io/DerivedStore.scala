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
  *  - FRESHNESS: a store records the per-file (path, size, mtime)
  *    state of every source table it derives from and rebuilds when
  *    any drifts — the incremental-refresh contract (a new corpus
  *    snapshot invalidates exactly the tiers derived from the tables
  *    that changed, nothing else rebuilds). The fingerprint travels
  *    INSIDE each committed version (`v=n/_fingerprint`, written into
  *    the staging dir before the commit rename), so data and the
  *    fingerprint that describes it are one atomic unit — there is no
  *    pointer file that can advertise a fingerprint for data that
  *    failed to land.
  *  - INCREMENTAL REFRESH: because the fingerprint is file-grain, the
  *    store can CLASSIFY drift instead of only detecting it. When
  *    every file the current version was built from is still present
  *    and byte-identical and the only change is NEW files (the
  *    warehouse's daily reality: immutable part files appended to a
  *    table, a new day landing in a partitioned layout), a tier that
  *    registered a merge callback ([[servedIncremental]]) builds its
  *    next version from the SERVED tier + just the delta files —
  *    the history-sized scan/join/distinct of a full rebuild never
  *    re-runs. Any other drift (shrink, in-place rewrite, unknown or
  *    legacy fingerprint) falls back to the full build. Publication
  *    of a merged version is byte-for-byte the same protocol as a
  *    full one — same staging, same fingerprint-inside-version, same
  *    OCC commit — so readers cannot tell (and need not care) how a
  *    version was produced.
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

  /** How the sources moved between a committed version's recorded
    * file-grain fingerprint and their current on-disk state. */
  sealed trait SourceDrift
  object SourceDrift {
    case object Unchanged extends SourceDrift
    /** Every recorded file is still present with identical size+mtime;
      * only new files appeared. `newFiles`: table → absolute paths. */
    final case class AppendOnly(newFiles: Map[String, Seq[String]]) extends SourceDrift
    /** Shrink, in-place rewrite, a table that was absent at build
      * time, or a legacy/unparseable record — full rebuild territory. */
    case object Rewritten extends SourceDrift
  }

  /** A tier's append-only refresh: `(session, sfDir, servedTier,
    * deltaFilesPerTable) => next version's rows`. */
  type Merge = (SparkSession, String, DataFrame, Map[String, Seq[String]]) => DataFrame

  /** A PURE-APPEND tier's delta producer for the LSM publish path
    * ([[servedIncrementalLsm]]): return ONLY the rows the next version
    * adds beside the served tier's (`next == prev ∪ delta`, no prev
    * row changes — per-key map tiers qualify; label/cluster tiers do
    * not). Returning None rejects the batch (re-ingested keys, any
    * precondition trip) and routes to the full build. */
  type DeltaMerge =
    (SparkSession, String, DataFrame, Map[String, Seq[String]]) => Option[DataFrame]

  /** A bucketed tier's upsert producer ([[servedIncrementalBucketed]]):
    * return the COMPLETE replacement rows for every key whose row the
    * refresh changes or adds (`next == (prev minus upsert keys) ∪
    * upserts`; deletions are not expressible). Keys are row-identities
    * under the tier's sortKey, so an upsert's disturbance is confined
    * to the hash-buckets its keys live in — the publish rewrites ONLY
    * those buckets and byte-copies the rest. Returning None rejects
    * the batch (precondition trip) and routes to the full build. */
  type UpsertMerge =
    (SparkSession, String, DataFrame, Map[String, Seq[String]]) => Option[DataFrame]

  /** Last build THIS THREAD ran: (store name, "full" | "merge") —
    * introspection for specs and the run-log note channel. Thread-local
    * (r11 review): serves are synchronous on the calling thread, and a
    * JVM-global slot would let any concurrent thread's serve (a query
    * against a stale tier while a DAG job rebuilds another) overwrite
    * the mode a tierJob is about to log — confidently wrong run-log
    * rows, the exact failure the channel exists to prevent. */
  private val lastBuildTl =
    ThreadLocal.withInitial[Option[(String, String)]](() => None)
  private[graft] def lastBuild: Option[(String, String)] = lastBuildTl.get()
  private[graft] def lastBuild_=(v: Option[(String, String)]): Unit =
    lastBuildTl.set(v)

  /** Last serve THIS THREAD resolved: (store name, "noop" | "merge" |
    * "full") — unlike [[lastBuild]], a fingerprint-fresh hit records
    * too ("noop"), so a nightly operator's run-log row can say WHICH
    * path served the tier (r10 verdict #4). Thread-local, same
    * rationale as [[lastBuild]]. */
  private val lastServeTl =
    ThreadLocal.withInitial[Option[(String, String)]](() => None)
  private[graft] def lastServe: Option[(String, String)] = lastServeTl.get()
  private[graft] def lastServe_=(v: Option[(String, String)]): Unit =
    lastServeTl.set(v)

  /** Test hook: invoked after the source fingerprint is taken and
    * before the build/merge reads the tables — specs land a concurrent
    * append inside exactly that window to drive the re-list path. */
  @volatile private[graft] var onFingerprinted: () => Unit = () => ()

  /** How many stage attempts a publish makes while the sources keep
    * moving under it before giving up and committing with the
    * [[ChurnSentinel]] fingerprint. */
  private val MaxStageAttempts = 3

  /** Fingerprint committed when the sources drifted on every stage
    * attempt: it can never match a real listing (real entries are
    * `table/relpath:size:mtime` lines), so the next serve rebuilds, and
    * [[classify]] reads it as [[SourceDrift.Rewritten]] — never
    * AppendOnly — so a merge can never re-digest files a churned build
    * may already have read. The source-table NAMES ride along on the
    * following lines (r10 verdict #2: they are statically known at
    * every call site), so [[sourcesOfVersion]] — and therefore
    * `tools/Lineage` — keeps tier provenance through a churned publish;
    * freshness semantics are untouched (the sentinel text still never
    * equals a real listing). */
  private val ChurnSentinel = "!churn"

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

  /** Merge-precondition probe for append-only tiers whose contract is
    * "delta files carry only NEW keys": true when any `key` in `delta`
    * already exists in the served tier — the re-ingestion case that
    * would silently duplicate tier rows if the merge ran anyway
    * (AnnIndex.append's loud require, expressed as the cheap check a
    * frame merge can fall back from).
    *
    * Cost discipline (r10 verdict #2): the exact check is one pass
    * over the tier's pruned key column — IO-only, but HISTORY-sized,
    * and for the token tier that is a nightly history read to answer a
    * delta-sized question. So the probe first consults the served
    * version's `_keysummary` sidecar (key min/max, written beside the
    * fingerprint at publish when the tier declares a `summaryKey`):
    * when the delta's key range is disjoint from the tier's — the
    * warehouse's monotonic-id reality — the answer is NO at
    * O(Δ + one 1-row sidecar read). When ranges STRADDLE (interleaved
    * key spaces), a second layer answers: versions with ≤
    * [[BloomMaxKeys]] distinct keys also carry a `_keybloom` (1% fpp),
    * and a delta none of whose keys might-contain is definitely
    * disjoint — still O(Δ). Only a bloom maybe (or a big/legacy/
    * keyless version) pays the exact semi-join; both layers can only
    * FALL THROUGH, never flip the answer. The sidecars are located
    * from `prev`'s OWN input files, so a concurrent publish of a newer
    * version can never pair v+1's summary with v's rows. */
  private[graft] def deltaKeysOverlap(prev: DataFrame, delta: DataFrame,
                                      key: String): Boolean = {
    val s = prev.sparkSession
    val vdir = versionDirOf(prev)
    // both sidecar layers describe the PUBLISH-TIME (kname, ktype)
    // column; a probe over any other key — or the same name at a
    // DIFFERENT type after schema evolution — must not trust them: a
    // long-built bloom probed with strings answers every key
    // might-not-contain, silently flipping overlap to disjoint (r11
    // advice). A legacy summary without either field also falls
    // through (to the exact probe, the safe direction).
    val deltaType = normKeyType(delta.schema(key).dataType)
    val summary = vdir.flatMap { v =>
      val sp = new Path(v, KeySummaryDir)
      if (!hadoopFs(s, sp).exists(sp)) None
      else Some(s.read.parquet(sp.toString))
        .filter(sf => sf.columns.contains("kname") && sf.columns.contains("ktype") &&
          !sf.filter(col("kname") === key && col("ktype") === deltaType).isEmpty)
    }
    val rangeDisjoint = summary.exists { sf =>
      import org.apache.spark.sql.functions.{min => fmin, max => fmax}
      val dAgg = delta.agg(fmin(col(key)).as("dmin"), fmax(col(key)).as("dmax"))
      // typed comparison stays in Spark: two 1-row frames, one job
      sf.crossJoin(dAgg)
        .filter(col("dmin") <= col("kmax") && col("dmax") >= col("kmin"))
        .isEmpty
    }
    if (rangeDisjoint) return false
    val bloomDisjoint = summary.nonEmpty && vdir.exists { v =>
      bloomAt(s, v).exists { bf =>
        mightContainCol(bf, delta, key)
          .exists(pred => delta.filter(pred).isEmpty)
      }
    }
    if (bloomDisjoint) return false
    !prev.select(key)
      .join(org.apache.spark.sql.functions.broadcast(delta.select(key).distinct()),
        Seq(key), "left_semi")
      .isEmpty
  }

  private val KeySummaryDir = "_keysummary"
  private val KeyBloomFile = "_keybloom"

  /** Bloom ceiling: 10M distinct keys @ 1% fpp ≈ 12 MB — a bounded
    * per-probe driver read. Versions with more keys keep only min/max
    * (the monotonic-append fast path); their straddling appends pay
    * the exact probe, honestly. */
  private val BloomMaxKeys = 10L * 1000 * 1000

  /** The `v=N` dir `prev` was read from, resolved from its input files
    * (None for a non-tier frame — exact-probe territory). */
  private def versionDirOf(prev: DataFrame): Option[Path] =
    prev.inputFiles.headOption.flatMap { f =>
      var p = new Path(f).getParent
      while (p != null && !p.getName.matches("v=\\d+")) p = p.getParent
      Option(p)
    }

  /** The bloom/range-comparable FAMILY of a summary key's type: the
    * integral family collapses to "long" (the bloom puts cast to long,
    * so an int delta probing a long-built bloom hashes identically);
    * strings stand alone; anything else keeps its exact catalog name
    * so only identically-typed probes trust the sidecars. */
  private def normKeyType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case StringType => "string"
      case other => other.catalogString
    }
  }

  /** Publish-time sidecars over the staged bytes: `_keysummary`
    * (1-row min/max + approx distinct count) and, when the count fits
    * [[BloomMaxKeys]] and the key type is bloomable, `_keybloom`.
    * Two pruned-column passes over data the publish just wrote. */
  private def writeKeySummary(s: SparkSession, stagingDir: String,
                              key: String): Unit = {
    import org.apache.spark.sql.functions.{approx_count_distinct, lit, min => fmin, max => fmax}
    val staged = s.read.parquet(stagingDir)
    val sp = new Path(stagingDir, KeySummaryDir)
    val agg = staged.agg(fmin(col(key)).as("kmin"), fmax(col(key)).as("kmax"),
        approx_count_distinct(col(key)).as("kcnt"))
      // the summarized column's NAME and TYPE ride along: a probe over
      // any other column, or this column at a different type, must
      // fall through to the exact check, not trust another column's
      // range or a differently-typed bloom (r11 review + advice)
      .withColumn("kname", lit(key))
      .withColumn("ktype", lit(normKeyType(staged.schema(key).dataType)))
      .persist()
    val cnt = agg.head().getAs[Long]("kcnt")
    // the bloom is built at a RECORDED capacity with 2× headroom, so
    // LSM appends can fold delta keys into it bit-compatibly instead
    // of rebuilding every night ([[mergeKeySummary]])
    val bloom =
      if (cnt > BloomMaxKeys) None
      else bloomKeyed(staged, key)
        .map(kf => bloomCapacity(cnt) ->
          kf.stat.bloomFilter(key, bloomCapacity(cnt), 0.01))
    agg.withColumn("bloomn",
        bloom.map(b => lit(b._1)).getOrElse(lit(null)).cast("long"))
      .coalesce(1).write.parquet(sp.toString)
    agg.unpersist(): Unit
    bloom.foreach { case (_, bf) =>
      val bp = new Path(stagingDir, KeyBloomFile)
      val out = hadoopFs(s, bp).create(bp, true)
      try bf.writeTo(out) finally out.close()
    }
  }

  private def bloomAt(s: SparkSession,
                      versionDir: Path): Option[org.apache.spark.util.sketch.BloomFilter] = {
    val bp = new Path(versionDir, KeyBloomFile)
    val fs = hadoopFs(s, bp)
    if (!fs.exists(bp)) None
    else {
      val in = fs.open(bp)
      try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
      finally in.close()
    }
  }

  /** A might-contain predicate over `delta(key)`, matching the typed
    * put the build used; None for key types the bloom doesn't cover. */
  private def mightContainCol(bf: org.apache.spark.util.sketch.BloomFilter,
                              delta: DataFrame,
                              key: String): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.udf
    import org.apache.spark.sql.types._
    delta.schema(key).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((x: java.lang.Long) => x != null && bf.mightContainLong(x))
        Some(f(col(key).cast("long")))
      case StringType =>
        val f = udf((x: String) => x != null && bf.mightContainString(x))
        Some(f(col(key)))
      case _ => None
    }
  }

  /** One fingerprint line per source DATA file (recursive, so a new
    * day dir in a partitioned layout is just new lines): sorted
    * `table/relpath:size:mtime` entries. Hidden files (`_`/`.`
    * prefixed segments — commit records, staging) are excluded: they
    * carry no rows, and rewriting a `_SUCCESS` must not look like
    * data drift. An absent table records a sentinel line so its later
    * materialization reads as a rewrite, never an append. */
  private def fileEntries(s: SparkSession, dir: String,
                          sources: Seq[String]): Seq[String] =
    sources.flatMap { t =>
      val p = new Path(dir, s"$t.parquet")
      val fs = hadoopFs(s, p)
      if (!fs.exists(p)) Seq(s"$t absent:0:0")
      else {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory)
          Seq(s"$t/${p.getName}:${st.getLen}:${st.getModificationTime}")
        else {
          val prefix = p.toUri.getPath
          val it = fs.listFiles(p, true)
          val buf = Seq.newBuilder[String]
          while (it.hasNext) {
            val f = it.next()
            val rel = f.getPath.toUri.getPath.stripPrefix(prefix).stripPrefix("/")
            if (!rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
              buf += s"$t/$rel:${f.getLen}:${f.getModificationTime}"
          }
          buf.result()
        }
      }
    }.sorted

  /** Classify how the sources moved since `prev` (a committed
    * version's recorded fingerprint) against `cur` (their state now). */
  private def classify(prev: String, cur: Seq[String], dir: String): SourceDrift = {
    // a churn-committed fingerprint (sentinel + table names) is never
    // merge-eligible, whatever its lines: the churned build may have
    // read files no listing describes
    if (prev.startsWith(ChurnSentinel)) return SourceDrift.Rewritten
    val prevSet = prev.split("\n").iterator.filter(_.nonEmpty).toSet
    val curSet = cur.toSet
    if (prevSet == curSet) SourceDrift.Unchanged
    else if (prevSet.nonEmpty && prevSet.subsetOf(curSet) &&
             !prevSet.exists(_.contains(" absent"))) {
      val fresh = (curSet -- prevSet).toSeq.sorted.flatMap { e =>
        // entry = table/relpath:size:mtime — table is the first '/'
        // segment, the trailing :size:mtime pair is stripped
        val slash = e.indexOf('/')
        val relAndStats = e.substring(slash + 1)
        val cut = relAndStats.lastIndexOf(':', relAndStats.lastIndexOf(':') - 1)
        if (slash < 0 || cut < 0) None
        else Some(e.substring(0, slash) -> relAndStats.substring(0, cut))
      }
      SourceDrift.AppendOnly(fresh.groupBy(_._1).map { case (t, es) =>
        t -> es.map { case (_, rel) => s"$dir/$t.parquet/$rel" }
      })
    } else SourceDrift.Rewritten
  }

  /** Where a tier lives on disk — the introspection surface specs and
    * tooling (ScanCount's tier mapping, Vacuum runs) key off. */
  def storePath(dir: String, name: String): String =
    s"$root/${dir.replace('/', '_').stripPrefix("_")}/$name"

  /** The SOURCE TABLES a committed version was derived from, parsed
    * from its recorded fingerprint (each line is `table/relpath:…` or
    * `table absent:…`). A churn-committed version carries its table
    * names on the lines after the sentinel, so provenance survives
    * exactly the publish where sources churned; None only when the
    * dir carries no fingerprint or a bare legacy sentinel. This is the
    * provenance hop `tools/Lineage` takes through a tier scan: a query
    * reading `purchase/v=3` traces to lineitem+orders, not to the
    * store path. */
  def sourcesOfVersion(s: SparkSession, versionPath: String): Option[Seq[String]] = {
    val p = new Path(versionPath, FingerprintFile)
    Sidecar.read(hadoopFs(s, p), p).flatMap { txt =>
      if (txt.startsWith(ChurnSentinel))
        Some(txt.split("\n").iterator.drop(1).filter(_.nonEmpty).toSeq)
          .filter(_.nonEmpty) // bare legacy sentinel: provenance unknown
      else Some(txt.split("\n").iterator.filter(_.nonEmpty).map { line =>
        val slash = line.indexOf('/')
        val space = line.indexOf(' ')
        val cut = Seq(slash, space).filter(_ >= 0).minOption.getOrElse(line.length)
        line.substring(0, cut)
      }.toSeq.distinct)
    }
  }

  /** Write a PROVENANCE-ONLY fingerprint into a (staged) version dir —
    * the churn-sentinel form: the text can never equal a real listing,
    * so the version can never be mistaken for source-fresh, [[classify]]
    * reads it as Rewritten (never merge-eligible), and
    * [[sourcesOfVersion]] — and therefore `tools/Lineage` — still
    * resolves the version to its source tables. For version stores
    * maintained OUTSIDE [[servedWith]]'s fingerprint lifecycle (the
    * stream-ingest gate's compacted folds, whose sources are stream
    * batches no file listing describes). */
  def writeProvenanceOnly(s: SparkSession, versionDir: String,
                          sources: Seq[String]): Unit = {
    val p = new Path(versionDir, FingerprintFile)
    Sidecar.write(hadoopFs(s, p), p,
      (ChurnSentinel +: sources.distinct.sorted).mkString("\n"))
  }

  /** Fingerprint a committed version was built from, if recorded. */
  private def versionFingerprint(s: SparkSession, store: String,
                                 v: Long): Option[String] = {
    val p = new Path(s"$store/v=$v", FingerprintFile)
    Sidecar.read(hadoopFs(s, p), p)
  }

  /** Serve `name` for `dir`: resolve the highest committed `v=n` whose
    * recorded fingerprint matches the sources' current state,
    * publishing a new version first if the store is absent or stale.
    * Builds are in-JVM-serialized; cross-process racers serialize on
    * the OCC commit. */
  def served(s: SparkSession, dir: String, name: String,
             sources: Seq[String],
             build: (SparkSession, String) => DataFrame,
             numFiles: Int, sortKey: String): DataFrame =
    servedWith(s, dir, name, sources, build, None, None, None, None, numFiles,
      sortKey, None)

  /** [[served]] plus an append-only fast path: when drift classifies
    * as [[SourceDrift.AppendOnly]], the next version is
    * `merge(s, dir, servedTier, deltaFiles)` instead of a full
    * `build` — O(delta + |tier|) instead of O(history). The merge
    * MUST produce exactly what `build` over the grown sources would
    * (the spec-pinned contract); any non-append drift still takes the
    * full build.
    *
    * `summaryKey`: the tier's row key — when set, every published
    * version carries a `_keysummary` sidecar (the key's min/max) that
    * [[deltaKeysOverlap]] consults to answer disjoint-range appends at
    * O(Δ) instead of a history-sized key-column scan. */
  def servedIncremental(s: SparkSession, dir: String, name: String,
                        sources: Seq[String],
                        build: (SparkSession, String) => DataFrame,
                        merge: Merge,
                        numFiles: Int, sortKey: String,
                        summaryKey: Option[String] = None): DataFrame =
    servedWith(s, dir, name, sources, build, Some(merge), None, None, None,
      numFiles, sortKey, summaryKey)

  /** [[servedIncremental]] with LSM publication for pure-append tiers:
    * on AppendOnly drift the next version is a BYTE-COPY of the served
    * one plus the delta written as sorted runs — history never moves
    * through a shuffle and never rewrites, so an append night costs
    * O(Δ) IO instead of the O(|tier|) full-layout rewrite the plain
    * merge pays (compute was already O(Δ) there; this closes the IO
    * side — at a corpus-sized token tier, the difference between
    * re-writing the warehouse nightly and appending the day). Appended
    * runs overlap the base's key ranges, so per-file pruning degrades
    * gradually until the file budget (4× the byte-ideal count) routes
    * one fold through a MAJOR rewrite that restores the tight layout —
    * the stream-index fold's minor/major split, applied to frame
    * tiers. Sidecars stay truthful at delta cost: `_filemap` = prev
    * entries + the new runs' stats; `_keysummary` merges min/max/count;
    * `_keybloom` merges the delta's keys into the served bloom while
    * the recorded capacity holds, rebuilding at 2× headroom when
    * exhausted (amortized to doublings). Readers and the oracle see
    * identical rows either way — `LsmTierSpec` pins merge == rebuild,
    * the guard path, and the budget trigger. */
  def servedIncrementalLsm(s: SparkSession, dir: String, name: String,
                           sources: Seq[String],
                           build: (SparkSession, String) => DataFrame,
                           deltaMerge: DeltaMerge,
                           numFiles: Int, sortKey: String,
                           summaryKey: Option[String] = None): DataFrame =
    servedWith(s, dir, name, sources, build, None, Some(deltaMerge), None, None,
      numFiles, sortKey, summaryKey)

  /** [[servedIncremental]] for tiers whose merge REWRITES rows (label/
    * cluster tiers — the one family the LSM append-only runs cannot
    * represent): the layout is hash-bucketed on the sortKey
    * (`b<k>-part-*.parquet`), and an append night rewrites ONLY the
    * buckets the merge's upserts touch, byte-copying the rest — IO
    * O(Δ · bucket-fanout) instead of the full-tier range shuffle +
    * rewrite the plain merge pays (r12 verdict #1). A contracted-label
    * night touches the few buckets holding relabeled docs; the common
    * night moves history as bytes. Correctness is the same
    * merge==rebuild contract: `next == (prev − upsert keys) ∪ upserts`,
    * spec-pinned row-equal to the full build. A bucket-layout sidecar
    * (`_buckets`) guards the merge precondition — a changed bucket
    * count or function routes to the full rebuild, never mis-routes a
    * key. */
  def servedIncrementalBucketed(s: SparkSession, dir: String, name: String,
                                sources: Seq[String],
                                build: (SparkSession, String) => DataFrame,
                                upsertMerge: UpsertMerge,
                                numBuckets: Int,
                                numFiles: Int, sortKey: String,
                                summaryKey: Option[String] = None): DataFrame =
    servedWith(s, dir, name, sources, build, None, None, Some(upsertMerge),
      Some(numBuckets), numFiles, sortKey, summaryKey)

  private def servedWith(s: SparkSession, dir: String, name: String,
                         sources: Seq[String],
                         build: (SparkSession, String) => DataFrame,
                         merge: Option[Merge],
                         deltaMerge: Option[DeltaMerge],
                         upsertMerge: Option[UpsertMerge],
                         numBuckets: Option[Int],
                         numFiles: Int, sortKey: String,
                         summaryKey: Option[String]): DataFrame = {
    val store = storePath(dir, name)
    def fresh(fp: String): Option[Long] = AtomicPublish.currentVersion(s, store)
      .filter(v => versionFingerprint(s, store, v).contains(fp))
    val fp0 = fileEntries(s, dir, sources).mkString("\n")
    var served = "noop"
    val version = fresh(fp0).getOrElse {
      lock.synchronized {
        fresh(fp0).getOrElse { // recheck under the lock
          dropPinnedPlans(s, dir, sources, store)
          publishRechecked(s, dir, sources, store, fp0) { fp =>
            // the one drift classification both refresh styles share:
            // (served version, AppendOnly delta files) — merge and
            // deltaMerge are mutually exclusive by construction, so
            // this evaluates at most once per attempt
            def appendDrift: Option[(Long, Map[String, Seq[String]])] = for {
              v <- AtomicPublish.currentVersion(s, store)
              recorded <- versionFingerprint(s, store, v)
              delta <- classify(recorded, fp.split("\n").toSeq, dir) match {
                case SourceDrift.AppendOnly(nf) => Some(nf)
                case _ => None
              }
            } yield (v, delta)
            lastLsmMode = None
            // the LSM path first: a pure-append tier with AppendOnly
            // drift whose deltaMerge accepts the batch stages the next
            // version as byte-copied base + delta-sized sorted runs
            val lsm = for {
              dm <- deltaMerge
              (v, delta) <- appendDrift
              prev = s.read.parquet(s"$store/v=$v")
              deltaRows <- dm(s, dir, prev, delta)
              // schema evolution cannot ride the byte-copy: mixed-schema
              // files would make the served read nondeterministically
              // hide or null the new column (the plain merge's
              // unionByName failed LOUDLY here) — route to the full
              // build, which lays the whole tier out under one schema
              if sameTierSchema(prev.schema, deltaRows.schema)
            } yield {
              lastBuild = Some(name -> "merge")
              served = "merge"
              stageLsm(s, store, v, deltaRows, delta, fp, numFiles, sortKey,
                summaryKey)
            }
            // the bucketed path: an upsert-producing merge confines its
            // disturbance to the hash-buckets its keys live in, so the
            // publish rewrites only those buckets (byte-copying the
            // rest) — the label-tier analogue of the LSM append
            val bucketed = for {
              um <- upsertMerge
              b <- numBuckets
              (v, delta) <- appendDrift
              prevDir = new Path(s"$store/v=$v")
              // layout precondition: prev must be bucketed the same way,
              // or a copied file's name would lie about its keys
              if bucketLayoutOf(s, prevDir).contains(b)
              // …and every data file must DECLARE its bucket (r13
              // advice #1): an in-place mutator's rewrite (TargetedDelete
              // lands `deleted-rewrite-*` names) holds rows the
              // name-keyed anti-join can't see — a patch would byte-copy
              // the old rows AND write replacements, duplicating keys
              // with conflicting labels. A foreign name routes to the
              // full rebuild; one listing, reused by the patch itself.
              if dataFilesOf(s, prevDir).forall(st =>
                bucketOfFileName(st.getPath.getName).isDefined)
              prev = s.read.parquet(prevDir.toString)
              upserts <- um(s, dir, prev, delta)
              // schema evolution cannot ride the byte-copy (the LSM
              // guard's reasoning): mixed-schema buckets would serve
              // nondeterministically — route to the full build
              if sameTierSchema(prev.schema, upserts.schema)
            } yield {
              lastBuild = Some(name -> "merge")
              served = "merge"
              stageBucketedPatch(s, store, prevDir, upserts, b, sortKey,
                summaryKey)
            }
            lsm.orElse(bucketed).getOrElse {
              // a merge may serve ANOTHER tier inside its body (the lsh
              // components merge probes the band-index tier) — the inner
              // serve re-enters the (reentrant) lock and may publish
              // first; lastBuild is set AFTER the callback so it reports
              // THIS store's mode, not the inner one's
              val (rows, mode) = (for {
                m <- merge
                (v, delta) <- appendDrift
              } yield (m(s, dir, s.read.parquet(s"$store/v=$v"), delta), "merge"))
                .getOrElse((build(s, dir), "full"))
              lastBuild = Some(name -> mode)
              served = mode
              val staging = numBuckets match {
                case Some(b) =>
                  stageBucketedFull(s, store, rows, b, fp, numFiles, sortKey,
                    summaryKey)
                case None =>
                  stageFullLayout(s, store, rows, fp, numFiles, sortKey,
                    summaryKey)
              }
              // an inner re-entrant serve (the build may refresh an
              // upstream LSM tier) must not leak ITS layout mode as
              // this full-layout publish's
              lastLsmMode = None
              staging
            }
          }
        }
      }
    }
    lastServe = Some(name -> served) // after any inner re-entrant serve
    val versionDir = s"$store/v=$version"
    // publish-time stats → optimizer (r12 verdict #4): register the
    // served version's exact rows/bytes and measured var-width column
    // widths so TierStatsRule prices scans of it from what the publish
    // counted, not raw file bytes or default type widths
    rowStatsOfVersion(s, versionDir).foreach { st =>
      val vp = new Path(versionDir)
      val fs = hadoopFs(s, vp)
      // signed with the _stats sidecar's len:mtime (r13 advice #2):
      // a store wiped and rebuilt at the same v=N path — or a takedown
      // that dropped the now-stale sidecar — invalidates the entry at
      // the next plan instead of pricing the old corpus
      val sigPath = fs.makeQualified(new Path(vp, RowStatsFile)).toString
      graft.plans.TierStatsCatalog.register(
        fs.makeQualified(vp).toString, st.rows, st.bytes, st.cols,
        sigPath = sigPath,
        sig = graft.plans.TierStatsCatalog.sigOf(
          s.sparkContext.hadoopConfiguration, sigPath))
    }
    s.read.parquet(versionDir)
  }

  /** The classic full-layout staging: one range-sorted write of the
    * whole row set plus fresh sidecars. */
  private def stageFullLayout(s: SparkSession, store: String, rows: DataFrame,
                              fp: String, numFiles: Int, sortKey: String,
                              summaryKey: Option[String]): Path =
    AtomicPublish.stageVersionWith(store) { p =>
      // numFiles is a floor, not the count: at warehouse scale
      // a fixed 8 would write multi-TB single-task files, so
      // the layout scales with the SOURCE bytes the
      // fingerprint already itemizes (tier size tracks source
      // size within a constant factor for every registered
      // tier; test-scale sources keep the configured floor)
      SortedLayout.writeRangeSorted(rows, p,
        scaledNumFiles(numFiles, fp), col(sortKey))
      // key sidecars for the O(Δ) overlap probe, paid inside
      // the publish they describe: min/max always (one
      // pruned-column pass), plus a bloom while the version's
      // distinct keys fit the bounded-size budget
      summaryKey.foreach(k => writeKeySummary(s, p, k))
      // file-grain zone map on the layout key: the range-sorted
      // files' disjoint [min,max] land in one `_filemap`
      // manifest, so keyed lookups (TokenStore term fetches,
      // TargetedDelete discovery) prune files without opening
      // parquet footers (r11 verdict #4)
      ZoneMap.write(s, p, sortKey)
      writeRowStats(s, p)
    }

  /** Exact stats of a version, recorded at publish so the OPTIMIZER
    * can consume them (r12 verdict #4): rows from parquet's
    * metadata-only count over data just written (footer row counts, no
    * data pages), bytes from the same kind of listing every publish
    * already does, and — for var-width columns (string/binary/array) —
    * the measured column profile ([[TableStats.columnProfile]]:
    * avg/max widths of var-width columns, HLL NDV + null count of
    * atomic columns), because rowCount-based estimation prices unknown
    * columns at DEFAULT widths (a 2KB text at 20 bytes — the direction
    * that wrongly BROADCASTS a wide tier) and join-cardinality
    * estimation keys on distinctCount (r13 verdict #2). One
    * column-pruned agg pass over data the publish just wrote, the same
    * discipline as `_keysummary`/`_filemap`. [[statsOfVersion]] reads
    * it back; `servedWith` registers it in
    * [[graft.plans.TierStatsCatalog]].
    *
    * Sidecar format: line 1 `rows,bytes`; one line per profiled column
    * `name\tavg\tmax\tndv\tnulls\tmin\tmax` with `-` for an unmeasured
    * field (min/max are numeric-only external strings, so the tab
    * framing is safe; v1 sidecars carried `name\tavg` only — the
    * parser accepts both). */
  private[io] val RowStatsFile = "_stats"

  private[graft] final case class TierRowStats(rows: Long, bytes: Long,
                                               cols: Map[String, graft.plans.ColStat])

  /** Measured per-column profile, one agg pass; empty for
    * fixed-width-only schemas with no atomic columns. Shared with the
    * raw-table ANALYZE ([[TableStats]]). */
  private def columnProfile(df: DataFrame,
                            rows: Long): Map[String, graft.plans.ColStat] =
    TableStats.columnProfile(df, rows)

  private def writeRowStatsRecord(s: SparkSession, dir: String,
                                  st: TierRowStats): Unit = {
    def f(o: Option[Long]) = o.fold("-")(_.toString)
    def g(o: Option[String]) = o.getOrElse("-")
    Sidecar.write(hadoopFs(s, new Path(dir)), new Path(dir, RowStatsFile),
      (s"${st.rows},${st.bytes}" +:
        st.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
          s"$c\t${f(cs.avgLen)}\t${f(cs.maxLen)}\t${f(cs.ndv)}\t${f(cs.nulls)}" +
            s"\t${g(cs.min)}\t${g(cs.max)}"
        }).mkString("\n"))
  }

  private def writeRowStats(s: SparkSession, dir: String): Unit = {
    val df = s.read.parquet(dir)
    val rows = df.count() // parquet metadata-only
    val bytes = dataFilesOf(s, new Path(dir)).map(_.getLen).sum
    writeRowStatsRecord(s, dir, TierRowStats(rows, bytes, columnProfile(df, rows)))
  }

  /** The stats a version's publish recorded; None for legacy versions.
    * Memoized against the sidecar FILE's (len, mtime) signature — a
    * committed version dir is immutable, but a long-lived JVM can see
    * a store wiped and rebuilt at the SAME v=N path (tests do; an
    * operator reset would), and a path-identity-only memo would then
    * feed the optimizer the old corpus's row counts (the
    * wrongly-broadcast direction). One getFileStatus per lookup, the
    * ZoneMap memo's discipline. */
  private val rowStatsMemo =
    new graft.core.LruMap[String, (String, Option[TierRowStats])](4096)

  private[graft] def rowStatsOfVersion(s: SparkSession,
                                       versionDir: String): Option[TierRowStats] = {
    val p = new Path(versionDir, RowStatsFile)
    val fs = hadoopFs(s, p)
    val sig = scala.util.Try {
      val st = fs.getFileStatus(p)
      s"${st.getLen}:${st.getModificationTime}"
    }.getOrElse("absent")
    rowStatsMemo.get(versionDir).collect {
      case (g, v) if g == sig => v
    }.getOrElse {
      val loaded = Sidecar.read(fs, p).flatMap { txt =>
        val lines = txt.trim.split("\n")
        lines.head.split(",") match {
          case Array(r, b) =>
            for (rr <- r.toLongOption; bb <- b.toLongOption) yield {
              val cols = lines.tail.flatMap { ln =>
                val parts = ln.split("\t", -1)
                def opt(i: Int) =
                  if (i < parts.length) parts(i).toLongOption else None
                def str(i: Int) =
                  if (i < parts.length && parts(i) != "-" && parts(i).nonEmpty)
                    Some(parts(i))
                  else None
                if (parts.length >= 2 && parts(0).nonEmpty) {
                  val cs = graft.plans.ColStat(opt(1), opt(2), opt(3), opt(4),
                    str(5), str(6))
                  if (cs == graft.plans.ColStat.empty) None
                  else Some(parts(0) -> cs)
                } else None
              }.toMap
              TierRowStats(rr, bb, cols)
            }
          case _ => None
        }
      }
      rowStatsMemo.put(versionDir, (sig, loaded)): Unit
      loaded
    }
  }

  private[graft] def statsOfVersion(s: SparkSession,
                                    versionDir: String): Option[(Long, Long)] =
    rowStatsOfVersion(s, versionDir).map(st => (st.rows, st.bytes))

  // -------------------------------------------------------------------
  // Bucketed layout ([[servedIncrementalBucketed]])
  // -------------------------------------------------------------------

  /** Layout sidecar: bucket count + function id. The merge precondition
    * reads it back — a prev version bucketed differently (or not at
    * all) cannot be byte-copied per bucket. Package-visible so the
    * in-place mutator ([[TargetedDelete]]) can drop it: its rewrites
    * land non-bucket file names, making the sidecar a lie. */
  private[io] val BucketsFile = "_buckets"

  /** The stable bucket of a key: Murmur3 (Spark's `hash`) mod B. */
  private def bucketExpr(sortKey: String, b: Int) =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(col(sortKey)),
      org.apache.spark.sql.functions.lit(b))

  /** Bucket a data file's name declares, None for foreign names. */
  private def bucketOfFileName(n: String): Option[Int] =
    if (!n.startsWith("b")) None
    else {
      val d = n.drop(1).takeWhile(_.isDigit)
      if (d.nonEmpty && n.startsWith(s"b$d-")) Some(d.toInt) else None
    }

  private def bucketLayoutOf(s: SparkSession, versionDir: Path): Option[Int] = {
    val p = new Path(versionDir, BucketsFile)
    Sidecar.read(hadoopFs(s, p), p).flatMap(_.trim.split(",") match {
      case Array(b, "murmur3") => b.toIntOption
      case _ => None
    })
  }

  /** Write `rows` into `destDir` as `b<k>-part-*.parquet` files: tag
    * with the bucket, shuffle so each task holds contiguous (bucket,
    * key) runs, write through `partitionBy` (the tag is DIRECTORY-
    * encoded, so the data files keep the clean tier schema), then move
    * each bucket dir's files up under bucket-prefixed names. */
  private def writeBucketFiles(s: SparkSession, rows: DataFrame, destDir: Path,
                               numBuckets: Int, numTasks: Int,
                               sortKey: String): Unit = {
    val tmp = new Path(destDir, ".bucketwrite")
    val fs = hadoopFs(s, tmp)
    fs.delete(tmp, true): Unit
    rows.withColumn("__b", bucketExpr(sortKey, numBuckets))
      .repartitionByRange(math.max(1, numTasks), col("__b"), col(sortKey))
      .sortWithinPartitions(col("__b"), col(sortKey))
      .write.partitionBy("__b").parquet(tmp.toString)
    var moved = 0
    fs.listStatus(tmp).filter(_.isDirectory).foreach { d =>
      val b = d.getPath.getName.stripPrefix("__b=")
      fs.listStatus(d.getPath)
        .filter(_.getPath.getName.startsWith("part-")).foreach { f =>
          require(fs.rename(f.getPath,
            new Path(destDir, s"b$b-${f.getPath.getName}")),
            s"bucket move ${f.getPath} failed")
          moved += 1
        }
    }
    fs.delete(tmp, true): Unit
    // an EMPTY frame through a dynamic-partition write lands zero data
    // files (Spark creates them lazily per partition value), which
    // would leave the staged version schema-less — every later read
    // (sidecar passes, the serve itself) fails inference. Land one
    // schema-bearing empty file under a BUCKET name: the merge
    // precondition now requires every data file to declare its bucket,
    // and "all rows (none) hash to bucket 0" is vacuously true, so a
    // later patch can byte-copy or rewrite it either way.
    if (moved == 0) {
      rows.limit(0).coalesce(1).write.parquet(tmp.toString)
      fs.listStatus(tmp).filter(_.getPath.getName.startsWith("part-"))
        .foreach { f =>
          require(fs.rename(f.getPath,
            new Path(destDir, s"b0-${f.getPath.getName}")),
            s"empty-bucket move ${f.getPath} failed")
        }
      fs.delete(tmp, true): Unit
    }
  }

  /** Full build under the bucketed layout (first publish and every
    * non-append drift). */
  private def stageBucketedFull(s: SparkSession, store: String, rows: DataFrame,
                                numBuckets: Int, fp: String, numFiles: Int,
                                sortKey: String,
                                summaryKey: Option[String]): Path =
    AtomicPublish.stageVersionWith(store) { p =>
      // the full layout wants ≥1 task per bucket AND source-scaled task
      // sizing (a 2TB tier must not funnel through 32 tasks)
      writeBucketFiles(s, rows, new Path(p), numBuckets,
        math.max(numBuckets, scaledNumFiles(numFiles, fp)), sortKey)
      Sidecar.write(hadoopFs(s, new Path(p)), new Path(p, BucketsFile),
        s"$numBuckets,murmur3")
      summaryKey.foreach(k => writeKeySummary(s, p, k))
      ZoneMap.write(s, p, sortKey)
      writeRowStats(s, p)
    }

  /** The bucketed partial rewrite: byte-copy every bucket the upserts
    * do NOT touch, rewrite only the touched ones as
    * `(prev bucket rows − upsert keys) ∪ upserts`. Touched buckets are
    * a ≤ numBuckets driver-side collect; the rewrite reads only the
    * touched buckets' FILES (by name, no footer opens elsewhere). The
    * `_filemap` is maintained at delta cost (kept files keep their
    * entries); `_keysummary`/`_stats` recompute — upserts REWRITE rows,
    * so no sidecar merge contract holds, and both are single
    * column-pruned passes over a narrow label tier. */
  private def stageBucketedPatch(s: SparkSession, store: String, prevDir: Path,
                                 upserts0: DataFrame, numBuckets: Int,
                                 sortKey: String,
                                 summaryKey: Option[String]): Path = {
    // the upsert frame is consumed by four actions (touched-bucket
    // collect, the rewrite, the summary merge, the manifest stats) —
    // cache it for the staging scope so the label contraction's joins
    // run once per night, not once per sidecar
    val upserts = upserts0.persist()
    try AtomicPublish.stageVersionWith(store) { p =>
      val touched = upserts.select(bucketExpr(sortKey, numBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      def isTouched(n: String) = bucketOfFileName(n).exists(touched.contains)
      copyTree(s, prevDir, new Path(p), keep = n =>
        !n.startsWith("_") && !n.startsWith(".") && !isTouched(n))
      if (touched.isEmpty) {
        // nothing changed (fingerprint drift without label impact): the
        // base's sidecars describe the new version verbatim — an empty
        // delta through the summary merge would null the min/max
        copyTree(s, prevDir, new Path(p), keep = n =>
          n == ZoneMap.ManifestDir || n == KeySummaryDir ||
            n == KeyBloomFile || n == RowStatsFile || n == BucketsFile)
      } else {
        // ONE listing per side feeds the rewrite input, its sizing,
        // and the manifest bookkeeping
        val prevData = dataFilesOf(s, prevDir)
        val prevTouched = prevData.filter(st => isTouched(st.getPath.getName))
        val rows =
          if (prevTouched.isEmpty) upserts
          else s.read.parquet(prevTouched.map(_.getPath.toString): _*)
            .join(upserts.select(sortKey), Seq(sortKey), "left_anti")
            .unionByName(upserts)
        // the rewrite is sized by the TOUCHED buckets' bytes (a patch of
        // 4 buckets in a 2TB tier is ~4 × tier/32, not the whole tier,
        // and a two-doc night is one task writing ~one file per bucket)
        val touchedBytes = prevTouched.map(_.getLen).sum
        writeBucketFiles(s, rows, new Path(p), numBuckets,
          math.max(touched.size.toLong,
            touchedBytes / SourceBytesPerFile).toInt, sortKey)
        Sidecar.write(hadoopFs(s, new Path(p)), new Path(p, BucketsFile),
          s"$numBuckets,murmur3")
        // _filemap at delta cost: kept (byte-copied) files keep their
        // entries, the rewritten buckets' files get a fresh stats pass
        val stagedData = dataFilesOf(s, new Path(p))
        ZoneMap.mergeManifest(s, prevDir.toString, p, sortKey,
          newFiles = stagedData.map(_.getPath)
            .filter(q => isTouched(q.getName)).map(_.toString),
          keptNames = Some(stagedData.map(_.getPath.getName)
            .filterNot(isTouched).toSet))
        // _keysummary/_keybloom at delta cost via the LSM merge: safe
        // for upserts even though they REWRITE rows — keys are never
        // removed, so min/max only extend; the kcnt overcount (updated
        // keys counted again) and the bloom superset both err
        // conservative (an earlier bloom rebuild, a false maybe → the
        // exact probe), never a wrong disjointness answer
        summaryKey.foreach(k => mergeKeySummary(s, prevDir, p, k, upserts))
        writeRowStats(s, p)
      }
    } finally upserts.unpersist(): Unit
  }

  /** Which layout the last LSM publish on THIS THREAD took ("append" |
    * "rewrite") — spec introspection; thread-local like [[lastBuild]]. */
  private val lastLsmTl =
    ThreadLocal.withInitial[Option[String]](() => None)
  private[graft] def lastLsmMode: Option[String] = lastLsmTl.get()
  private[graft] def lastLsmMode_=(v: Option[String]): Unit = lastLsmTl.set(v)

  /** Test hook: force the LSM major-rewrite file budget. */
  @volatile private[graft] var lsmBudgetOverride: Option[Long] = None

  /** Major-rewrite trigger for LSM tiers: appended runs may grow the
    * version to 4× its byte-ideal file count before a publish pays the
    * history shuffle to restore the tight layout. */
  private def lsmFileBudget(bytes: Long, numFiles: Int): Long =
    lsmBudgetOverride.getOrElse(
      4L * math.max(numFiles.toLong, bytes / SourceBytesPerFile))

  /** Non-hidden data files directly under a (flat) version dir. */
  private def dataFilesOf(s: SparkSession, dir: Path) = {
    val fs = hadoopFs(s, dir)
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** LSM staging: minor (byte-copy base + delta-sized sorted runs +
    * delta-cost sidecar maintenance) until the base's file count
    * breaches [[lsmFileBudget]], then one major rewrite (base ∪ delta
    * through the full layout). `deltaFiles` (the AppendOnly source
    * paths) size the delta writer — tier bytes track source bytes
    * within a constant factor, the [[scaledNumFiles]] argument. */
  /** Same tier row shape (names + types, order- and nullability-
    * insensitive — parquet round-trips widen containsNull/nullable, so
    * nullability must be normalized RECURSIVELY or every array-column
    * tier would flunk its own byte-copy precondition) — the LSM
    * append's guard against mixed-schema versions. */
  private def sameTierSchema(a: org.apache.spark.sql.types.StructType,
                             b: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.types._
    def denull(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(denull(e), containsNull = true)
      case MapType(k, v, _) => MapType(denull(k), denull(v), valueContainsNull = true)
      case StructType(fs) =>
        StructType(fs.map(f => StructField(f.name, denull(f.dataType))))
      case other => other
    }
    a.fields.map(f => f.name -> denull(f.dataType)).toSet ==
      b.fields.map(f => f.name -> denull(f.dataType)).toSet
  }

  private def stageLsm(s: SparkSession, store: String, v: Long,
                       deltaRows: DataFrame,
                       deltaFiles: Map[String, Seq[String]], fp: String,
                       numFiles: Int, sortKey: String,
                       summaryKey: Option[String]): Path = {
    val prevDir = new Path(s"$store/v=$v")
    val prevData = dataFilesOf(s, prevDir)
    val prevBytes = prevData.map(_.getLen).sum
    // the mode is recorded only after its staging completes — an
    // aborted attempt must not leave a mode for a later reader to
    // pair with an earlier success (the r11 fold-mode discipline)
    if (prevData.size > lsmFileBudget(prevBytes, numFiles)) {
      val staging = stageFullLayout(s, store,
        s.read.parquet(prevDir.toString).unionByName(deltaRows), fp, numFiles,
        sortKey, summaryKey)
      lastLsmMode = Some("rewrite")
      staging
    } else {
      val deltaBytes = deltaFiles.valuesIterator.flatten.map { f =>
        val p = new Path(f)
        hadoopFs(s, p).getFileStatus(p).getLen
      }.sum
      val staging = AtomicPublish.stageVersionWith(store) { p =>
        copyTree(s, prevDir, new Path(p),
          keep = n => !n.startsWith("_") && !n.startsWith("."))
        deltaRows.repartitionByRange(
            math.max(1, math.min(deltaBytes / SourceBytesPerFile,
              MaxTierFiles).toInt), col(sortKey))
          .sortWithinPartitions(col(sortKey))
          .write.mode("append").parquet(p)
        val prevNames = prevData.map(_.getPath.getName).toSet
        val newFiles = dataFilesOf(s, new Path(p))
          .filterNot(st => prevNames(st.getPath.getName))
          .map(_.getPath.toString)
        mergeSidecars(s, prevDir, p, newFiles, sortKey, summaryKey)
      }
      lastLsmMode = Some("append")
      staging
    }
  }

  /** Delta-cost sidecar maintenance for an LSM append: copied base
    * files kept their names, so prev entries stay valid — only the new
    * runs need stats. */
  private def mergeSidecars(s: SparkSession, prevDir: Path, stagingDir: String,
                            newFiles: Seq[String], sortKey: String,
                            summaryKey: Option[String]): Unit = {
    if (newFiles.isEmpty) {
      // empty delta: the base's sidecars describe the new version too
      copyTree(s, prevDir, new Path(stagingDir),
        keep = n => n == ZoneMap.ManifestDir || n == KeySummaryDir ||
          n == KeyBloomFile || n == RowStatsFile)
      return
    }
    val newDf = s.read.parquet(newFiles: _*) // shared by all three sidecars
    // _stats at delta cost: rows ADD unconditionally under the
    // append-only contract (a metadata-only count over the new runs);
    // bytes re-listed; column profiles merge field-wise (below). A
    // legacy base without the sidecar pays one full pass, then stays
    // delta-cost forever.
    rowStatsOfVersion(s, prevDir.toString) match {
      case Some(prev) =>
        val deltaN = newDf.count()
        val deltaCols = columnProfile(newDf, deltaN)
        val bytes = dataFilesOf(s, new Path(stagingDir)).map(_.getLen).sum
        val tot = prev.rows + deltaN
        // merge grain (r14 review): a row-free delta (appended files,
        // zero rows) adds NO values, so prev's profile stays exact; a
        // row-free BASE means the delta IS the tier, so its profile is
        // exact. Otherwise merge field-wise over prev's columns —
        // columns only the delta measured (a legacy avg-only base) are
        // OMITTED, not taken: a delta-grain width or interval presented
        // as tier-grain would understate widths (the wrongly-broadcast
        // direction) and SHRINK value intervals (the false-disjoint
        // zero-estimate direction); they refresh at the next rewrite.
        val mergedCols: Map[String, graft.plans.ColStat] =
          if (deltaN == 0) prev.cols
          else if (prev.rows == 0) deltaCols
          else prev.cols.map { case (c, p) =>
            val d = deltaCols.getOrElse(c, graft.plans.ColStat.empty)
            // field absences on the DELTA side mean "no measurable
            // values added" (an all-null column, a non-finite float
            // aggregate — schema drift can't reach here, the
            // sameTierSchema guard routed it to the full build): prev's
            // measurement still covers every measured value, so keep
            // it rather than dropping to defaults. Absences on the
            // PREV side stay absent — see the grain note above.
            val avg = (p.avgLen, d.avgLen) match {
              case (Some(pl), Some(dl)) =>
                Some((prev.rows * pl + deltaN * dl + tot - 1) / tot)
              case (pa, _) => pa
            }
            val mx = (p.maxLen, d.maxLen) match {
              case (Some(a), Some(b)) => Some(a max b)
              case (pa, _) => pa
            }
            // NDV cannot merge from two scalars. ONLY the summarized
            // key's values are DISJOINT under the deltaMerge contract
            // (counts add exactly); every other column — including the
            // sort key, whose values recur across append nights in the
            // token/band tiers — keeps the larger side, a LOWER bound
            // of the true NDV: the conservative direction for join
            // estimation (an understated NDV overestimates join
            // output; an overstated one under-estimates and wrongly
            // broadcasts, compounding every night it is summed)
            val disjointKey = summaryKey.contains(c)
            val nd = (p.ndv, d.ndv) match {
              case (Some(a), Some(b)) => Some(if (disjointKey) a + b else a max b)
              case (pa, _) => pa
            }
            // nulls add exactly under appends
            val nl = (p.nulls, d.nulls) match {
              case (Some(a), Some(b)) => Some(a + b)
              case (pa, _) => pa
            }
            // value bounds widen exactly under appends (numeric
            // external strings; BigDecimal compare, since "9" < "10"
            // textually fails); an unparseable bound drops both sides
            def widen(a: Option[String], b: Option[String],
                      pick: (BigDecimal, BigDecimal) => BigDecimal) =
              (a, b) match {
                case (Some(x), Some(y)) => scala.util.Try(
                  if (pick(BigDecimal(x), BigDecimal(y)) == BigDecimal(x)) x
                  else y).toOption
                case (pa, _) => pa
              }
            val vmin = widen(p.min, d.min, _ min _)
            val vmax = widen(p.max, d.max, _ max _)
            c -> graft.plans.ColStat(avg, mx, nd, nl, vmin, vmax)
          }
        writeRowStatsRecord(s, stagingDir, TierRowStats(tot, bytes, mergedCols))
      case None => writeRowStats(s, stagingDir)
    }
    // _filemap: prev entries + the new runs' stats (ranges may overlap
    // the base's — pruning degrades gracefully, never wrongly, until
    // the major rewrite restores disjointness)
    ZoneMap.mergeManifest(s, prevDir.toString, stagingDir, sortKey, newFiles)
    summaryKey.foreach(k => mergeKeySummary(s, prevDir, stagingDir, k, newDf))
  }

  /** Merge the 1-row `_keysummary` (min/max combine; counts ADD — the
    * deltaMerge contract guarantees disjoint keys) and fold the delta's
    * keys into the served `_keybloom` while its recorded capacity
    * holds; an exhausted or legacy bloom rebuilds at 2× headroom (one
    * pruned-column pass, amortized to corpus doublings). Any
    * kname/ktype mismatch falls back to the full recompute. */
  private def mergeKeySummary(s: SparkSession, prevDir: Path,
                              stagingDir: String, key: String,
                              newDf: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{approx_count_distinct, greatest, least, lit, min => fmin, max => fmax}
    val prevSummary = new Path(prevDir, KeySummaryDir)
    val mergeable = hadoopFs(s, prevSummary).exists(prevSummary) && {
      val sf = s.read.parquet(prevSummary.toString)
      sf.columns.contains("kname") && sf.columns.contains("ktype") &&
        !sf.filter(col("kname") === key &&
          col("ktype") === normKeyType(newDf.schema(key).dataType)).isEmpty
    }
    if (!mergeable) { writeKeySummary(s, stagingDir, key); return }
    val prevSf = s.read.parquet(prevSummary.toString)
    val prevRow = prevSf.head()
    val dAgg = newDf.agg(fmin(col(key)).as("dmin"), fmax(col(key)).as("dmax"),
      approx_count_distinct(col(key)).as("dcnt")).persist()
    val cnt = prevRow.getAs[Long]("kcnt") + dAgg.head().getAs[Long]("dcnt")
    val prevCap =
      if (prevSf.columns.contains("bloomn"))
        Option(prevRow.getAs[java.lang.Long]("bloomn")).map(_.toLong)
      else None
    val (bloom, cap) = (bloomAt(s, prevDir), prevCap) match {
      case (Some(pb), Some(c)) if cnt <= c =>
        // O(Δ): a delta bloom built at the RECORDED capacity is
        // bit-compatible with the served one
        bloomKeyed(newDf, key).flatMap { kf =>
          scala.util.Try {
            val db = kf.stat.bloomFilter(key, c, 0.01)
            db.mergeInPlace(pb); db
          }.toOption
        } match {
          case Some(db) => (Some(db), Some(c))
          case None => rebuildBloom(s, stagingDir, key, cnt)
        }
      case _ => rebuildBloom(s, stagingDir, key, cnt)
    }
    prevSf.crossJoin(dAgg)
      .select(least(col("kmin"), col("dmin")).as("kmin"),
        greatest(col("kmax"), col("dmax")).as("kmax"),
        (col("kcnt") + col("dcnt")).as("kcnt"),
        col("kname"), col("ktype"))
      .withColumn("bloomn",
        cap.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .coalesce(1).write.parquet(s"$stagingDir/$KeySummaryDir")
    dAgg.unpersist(): Unit
    bloom.foreach { bf =>
      val bp = new Path(stagingDir, KeyBloomFile)
      val out = hadoopFs(s, bp).create(bp, true)
      try bf.writeTo(out) finally out.close()
    }
  }

  /** Fresh-capacity bloom over the whole staged tier — the exhausted/
    * legacy fallback; None when the tier outgrew [[BloomMaxKeys]]. */
  private def rebuildBloom(s: SparkSession, stagingDir: String, key: String,
                           cnt: Long): (Option[org.apache.spark.util.sketch.BloomFilter], Option[Long]) =
    if (cnt > BloomMaxKeys) (None, None)
    else {
      val cap = bloomCapacity(cnt)
      bloomKeyed(s.read.parquet(stagingDir), key) match {
        // capacity is recorded ONLY beside a bloom that exists — a
        // bloomn without a _keybloom would lie to any reader trusting
        // the pair (writeKeySummary keeps the same symmetry)
        case Some(kf) => (Some(kf.stat.bloomFilter(key, cap, 0.01)), Some(cap))
        case None => (None, None)
      }
    }

  /** Bloom capacity for a tier with `cnt` distinct keys: 2× headroom
    * so nightly appends merge instead of rebuilding, capped at
    * [[BloomMaxKeys]]. */
  private def bloomCapacity(cnt: Long): Long =
    math.min(math.max(2L * math.max(cnt, 1L), 1024L), BloomMaxKeys)

  /** The bloom-typed projection of `key` (the same casts the probe
    * uses); None for types the bloom doesn't cover. */
  private def bloomKeyed(df: DataFrame, key: String): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    df.schema(key).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(df.select(col(key).cast("long").as(key)))
      case StringType => Some(df.select(col(key)))
      case _ => None
    }
  }

  /** ~256 MB of source bytes per tier output file — the shuffle-
    * partition-sized unit that keeps single-file write tasks bounded
    * and keyed reads parallel at any corpus size. Shared with the
    * stream-index fold's writer sizing. */
  private[graft] val SourceBytesPerFile = 256L * 1024 * 1024

  /** Sanity ceiling on any bytes-scaled file count. */
  private[graft] val MaxTierFiles = 200000L

  /** Scale a tier's file count with its sources: `base` is the floor
    * (small/test corpora keep it), and every [[SourceBytesPerFile]] of
    * fingerprinted source data adds a file. Parsed from the
    * fingerprint's own `path:size:mtime` lines — no extra listing. */
  private def scaledNumFiles(base: Int, fp: String): Int = {
    val bytes = fp.split("\n").iterator.filter(_.nonEmpty).map { line =>
      val parts = line.split(':')
      if (parts.length >= 3) parts(parts.length - 2).toLongOption.getOrElse(0L)
      else 0L
    }.sum
    math.max(base, math.min(bytes / SourceBytesPerFile, MaxTierFiles).toInt)
  }

  /** A stale store about to rebuild/merge must not read plans pinned
    * to the PRE-drift file snapshot: Spark's cache manager matches a
    * re-read of the same path against a cached entry built from
    * yesterday's listing (HadoopFsRelation equality is path-grain, not
    * file-grain), so a long-lived session that cached source-derived
    * frames before an append would publish a tier missing the delta —
    * with a fingerprint that claims it. The release is SCOPED
    * (r10 review): only registered caches that scan one of THIS
    * tier's source tables with a listing that no longer matches disk
    * are dropped — a cache the in-flight query registered over the
    * post-drift listing (or over unrelated tables) survives, so the
    * stale-serve night doesn't re-introduce the double-scans the
    * registered-cache discipline exists to prevent. Only done when a
    * committed version exists and went stale, the one case where a
    * pinned pre-drift plan can poison the publish. */
  private def dropPinnedPlans(s: SparkSession, dir: String,
                              sources: Seq[String], store: String): Unit =
    if (AtomicPublish.currentVersion(s, store).nonEmpty)
      releaseStaleSourceCaches(s, dir, sources)

  /** Release registered caches whose pinned file listing for any of
    * `sources` disagrees with the current on-disk listing. */
  private def releaseStaleSourceCaches(s: SparkSession, dir: String,
                                       sources: Seq[String]): Unit = {
    val roots = sources.flatMap { t =>
      val p = new Path(dir, s"$t.parquet")
      val fs = hadoopFs(s, p)
      if (!fs.exists(p)) None
      else {
        val q = fs.makeQualified(p)
        val files = Set.newBuilder[String]
        if (!fs.getFileStatus(q).isDirectory) files += q.toString
        else {
          val it = fs.listFiles(q, true)
          while (it.hasNext) {
            val f = it.next().getPath
            val rel = f.toUri.getPath.stripPrefix(q.toUri.getPath).stripPrefix("/")
            if (!rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
              files += f.toString
          }
        }
        Some(q.toString -> files.result())
      }
    }.toMap
    graft.core.Caching.releaseIf { ds =>
      val files = ds.inputFiles
      roots.exists { case (root, cur) =>
        val underRoot = files.filter(f => f == root || f.startsWith(root + "/")).toSet
        underRoot.nonEmpty && underRoot != cur
      }
    }: Unit
  }

  /** Stage-then-verify publication: `stage(fp)` builds a version from
    * sources fingerprinted as `fp`, then the sources are re-listed —
    * a write landing between the fingerprint and the build's read
    * (the TOCTOU freshness race) shows up as a mismatch, the staged
    * bytes are discarded, and the attempt repeats against the fresh
    * listing. A source that never quiesces ([[MaxStageAttempts]]
    * straight misses) commits the final attempt under
    * [[ChurnSentinel]]: served data stays complete-and-committed, but
    * the version can never be mistaken for fresh, and the sentinel
    * classifies as Rewritten so no merge re-digests ambiguous files. */
  private def publishRechecked(s: SparkSession, dir: String,
                               sources: Seq[String], store: String,
                               fp0: String)(stage: String => Path): Long = {
    var fp = fp0
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      attempt += 1
      onFingerprinted()
      val staging = stage(fp)
      val fpAfter = fileEntries(s, dir, sources).mkString("\n")
      if (fpAfter == fp) committed = commitStaged(s, store, staging, fp)
      else if (attempt >= MaxStageAttempts)
        // the sentinel line is followed by the (statically known)
        // source TABLE names so provenance survives the churn; the
        // combined text still never equals a real listing
        committed = commitStaged(s, store, staging,
          (ChurnSentinel +: sources.distinct.sorted).mkString("\n"))
      else {
        hadoopFs(s, staging).delete(staging, true): Unit
        // the retry's fresh read must not pin the listing the torn
        // attempt cached — same scoped release, unconditional here
        // (unlike dropPinnedPlans' committed-version gate): drift
        // mid-build is proven
        releaseStaleSourceCaches(s, dir, sources)
        fp = fpAfter
      }
    }
    committed
  }

  /** Serve a DIRECTORY-shaped tier — multi-dataset artifacts whose
    * builder owns the inner layout (an ANN index's centroids +
    * cell-partitioned postings + metric marker) — through the same
    * fingerprint/OCC protocol as the frame tiers. Returns the fresh
    * committed version's PATH; the caller reads the structure inside.
    * Directory tiers are full-rebuild-only: incremental maintenance of
    * a multi-dataset artifact is the builder's own lifecycle (e.g.
    * `AnnIndex.append`), not a frame merge. */
  def servedDir(s: SparkSession, dir: String, name: String,
                sources: Seq[String])
               (write: (SparkSession, String, String) => Unit): String =
    servedDirWith(s, dir, name, sources, write, None)

  /** A directory tier's append-only refresh callback:
    * `(session, sfDir, stagingPath, deltaFilesPerTable) => merged?`.
    * When invoked, `stagingPath` already holds a byte-copy of the
    * served version's artifacts; the callback folds the delta files
    * into them in place (e.g. `AnnIndex.append` + partition
    * compaction) and returns true, or returns false to reject the
    * batch (a precondition trip — centroid-eligible ids, key overlap)
    * and route the refresh to the full build. */
  type DirMerge = (SparkSession, String, String, Map[String, Seq[String]]) => Boolean

  /** [[servedDir]] plus the append-only fast path ([[servedIncremental]]'s
    * contract for directory artifacts): on AppendOnly drift the next
    * version starts as an IO-only byte-copy of the served one — no
    * recompute of the artifact's build (for an ANN index: no centroid
    * election, no corpus re-assignment, no re-encode of history) —
    * and `merge` folds just the delta in. Any other drift, or a merge
    * returning false, takes the full `write`. The copy is the price of
    * immutable versions: bytes move, computation doesn't. */
  def servedDirIncremental(s: SparkSession, dir: String, name: String,
                           sources: Seq[String])
                          (write: (SparkSession, String, String) => Unit)
                          (merge: DirMerge): String =
    servedDirWith(s, dir, name, sources, write, Some(merge))

  private def servedDirWith(s: SparkSession, dir: String, name: String,
                            sources: Seq[String],
                            write: (SparkSession, String, String) => Unit,
                            merge: Option[DirMerge]): String = {
    val store = storePath(dir, name)
    def fresh(fp: String): Option[Long] = AtomicPublish.currentVersion(s, store)
      .filter(v => versionFingerprint(s, store, v).contains(fp))
    val fp0 = fileEntries(s, dir, sources).mkString("\n")
    var served = "noop"
    val version = fresh(fp0).getOrElse {
      lock.synchronized {
        fresh(fp0).getOrElse {
          dropPinnedPlans(s, dir, sources, store)
          publishRechecked(s, dir, sources, store, fp0) { fp =>
            val staged = for {
              m <- merge
              v <- AtomicPublish.currentVersion(s, store)
              recorded <- versionFingerprint(s, store, v)
              delta <- classify(recorded, fp.split("\n").toSeq, dir) match {
                case SourceDrift.AppendOnly(nf) => Some(nf)
                case _ => None
              }
              p <- {
                val staging = AtomicPublish.stageVersionWith(store)(pp =>
                  copyVersion(s, s"$store/v=$v", pp))
                if (m(s, dir, staging.toString, delta)) Some(staging)
                else { // guard trip: discard the copy, take the full build
                  hadoopFs(s, staging).delete(staging, true): Unit
                  None
                }
              }
            } yield p
            val mode = if (staged.isDefined) "merge" else "full"
            lastBuild = Some(name -> mode)
            served = mode
            staged.getOrElse(
              AtomicPublish.stageVersionWith(store)(p => write(s, dir, p)))
          }
        }
      }
    }
    lastServe = Some(name -> served)
    s"$store/v=$version"
  }

  /** Byte-copy a committed version's artifacts into a staging dir —
    * the commit records (`_SUCCESS`, `_fingerprint`) stay behind;
    * [[commitStaged]] writes the new version's own. */
  private def copyVersion(s: SparkSession, from: String, to: String): Unit =
    copyTree(s, new Path(from), new Path(to),
      keep = n => n != FingerprintFile && n != "_SUCCESS")

  /** Driver-side recursive copy of a version dir's entries whose names
    * pass `keep` — the one byte-copy loop behind every "new version
    * starts as a copy of the served one" path (frame/dir tiers here,
    * the stream-index fold's minor compaction). */
  /** Test hook / tuning knob: the file count above which [[copyTree]]
    * fans the per-file byte moves out to executors. The driver loop is
    * right for test-grain trees (no job overhead); a warehouse-scale
    * base (the nightly fold / LSM-append history move) must not stream
    * every history byte through one driver thread. */
  @volatile private[graft] var distributedCopyMinFiles = 33

  private[graft] def copyTree(s: SparkSession, from: Path, to: Path,
                              keep: String => Boolean): Unit = {
    val fs = hadoopFs(s, from)
    val conf = s.sparkContext.hadoopConfiguration
    fs.mkdirs(to): Unit
    // enumerate kept FILES with their paths relative to `from` — the
    // unit of parallel copy. Directories are re-created up front
    // (cheap metadata ops) so an EMPTY subdir survives the copy the
    // way the old recursive FileUtil.copy preserved it — a dir-tier
    // artifact's reader must find the directory it left behind.
    val rels = Seq.newBuilder[String]
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val r = if (rel.isEmpty) st.getPath.getName
                else s"$rel/${st.getPath.getName}"
        if (st.isDirectory) { fs.mkdirs(new Path(to, r)): Unit; walk(st.getPath, r) }
        else rels += r
      }
    fs.listStatus(from).foreach { st =>
      if (keep(st.getPath.getName)) {
        if (st.isDirectory) {
          fs.mkdirs(new Path(to, st.getPath.getName)): Unit
          walk(st.getPath, st.getPath.getName)
        } else rels += st.getPath.getName
      }
    }
    val files = rels.result()
    if (files.size <= distributedCopyMinFiles)
      files.foreach { r =>
        org.apache.hadoop.fs.FileUtil.copy(fs, new Path(from, r), fs,
          new Path(to, r), false, conf): Unit
      }
    else {
      // distributed byte move: one executor task per file batch, each
      // opening src/dst through its own FileSystem — history bytes
      // never pass through the driver. The Hadoop conf travels as
      // key-value pairs (Configuration itself is not serializable).
      import scala.jdk.CollectionConverters._
      val confKv = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
      val (fromS, toS) = (from.toString, to.toString)
      val slices = math.min(files.size, s.sparkContext.defaultParallelism * 4)
      s.sparkContext.parallelize(files, slices).foreachPartition { it =>
        val c = new org.apache.hadoop.conf.Configuration()
        confKv.foreach { case (k, v) => c.set(k, v) }
        it.foreach { r =>
          val src = new Path(s"$fromS/$r")
          val dst = new Path(s"$toS/$r")
          org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(c), src,
            dst.getFileSystem(c), dst, false, c): Unit
        }
      }
    }
  }

  /** The shared publication tail: drop the fingerprint (and a
    * `_SUCCESS` commit record if the writer didn't leave one at the
    * root — parquet writes do, directory builders may not) INSIDE the
    * staged dir, then the OCC commit rename and the keep-2 GC sweep. */
  private def commitStaged(s: SparkSession, store: String, staging: Path,
                           fp: String): Long = {
    // the fingerprint rides inside the staged version so the
    // commit rename publishes data + provenance atomically
    val fs = hadoopFs(s, staging)
    val out = fs.create(new Path(staging, FingerprintFile), true)
    try out.write(fp.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val succ = new Path(staging, "_SUCCESS")
    if (!fs.exists(succ)) fs.create(succ, true).close()
    val n = AtomicPublish.commitStagedOcc(s, store, staging)
    // superseded versions survive ONE refresh cycle: a reader
    // that resolved v(n-1) moments ago keeps its files until
    // the NEXT publish (Vacuum's keep-window, shared GC)
    Vacuum.sweep(s, store, keepVersions = 2): Unit
    n
  }
}
