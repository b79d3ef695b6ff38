package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caching.RegisterSyntax
import graft.core.Tables

/** Materialized graph-edge tier — `text/TokenStore`'s build-once
  * pattern applied to the g-family (round-7 verdict #2).
  *
  * Every g-query is built on one of two derived edge sets:
  *
  *  - the PURCHASE edges: distinct customer→supplier pairs from
  *    lineitem⋈orders (g1/g3/g5/g6/g8/g9/g10), and
  *  - the CO-SUPPLY edges: each supplier's top-3 strongest partners
  *    by shared parts, canonicalized to undirected `eu < ev` pairs
  *    (g2/g4/g11) — the expensive wedge self-join.
  *
  * Rebuilding those inside every query is the "raw loads feed every
  * job" anti-pattern the reference's derived-table tier exists to
  * avoid (`AWS_GLUE_ETL.py:79-132`: compute domain tables once, serve
  * all downstream jobs). Here each edge set is computed ONCE per
  * source snapshot, written range-sorted on its join key
  * ([[SortedLayout.writeRangeSorted]] — per-file min/max prune
  * node-keyed lookups), and every consumer reads the parquet tier.
  *
  * Freshness is fingerprint-keyed, not faith-based: the store records
  * the (size, mtime) of every source table it was derived from and
  * rebuilds when they drift — the incremental-refresh contract a
  * 100 TB tier needs (a new corpus snapshot invalidates exactly the
  * stores derived from the tables that changed). Publication is
  * versioned-atomic (each build stages under a `.tx-` dir and commits
  * as `v=<n>` + `_SUCCESS` via [[AtomicPublish]]'s OCC rename —
  * [[DerivedStore]]'s shared protocol), so a concurrent reader always
  * resolves a complete version; superseded versions survive one
  * refresh cycle.
  *
  * The inline forms stay available ([[purchaseEdgesInline]] /
  * [[cosupplyUndInline]]) — they are the semantic ground truth the
  * served tier is row-equal to (`GraphStoreSpec`), and what the
  * DuckDB oracles compute independently from the raw tables.
  */
object GraphStore {

  /** Supplier ids offset to share a node-id space with customers —
    * THE constant, not a copy ([[graft.graph.Graph.SuppOffset]]). */
  private val SuppOffset = graft.graph.Graph.SuppOffset

  // ---------------------------------------------------------------------
  // Inline (self-contained) builders — the ground-truth forms
  // ---------------------------------------------------------------------

  /** Distinct customer→supplier purchase pairs; supplier ids offset.
    * Columns: `cust`, `supp` (BIGINT) plus the two degree columns
    * every consumer otherwise recomputes (`cust_deg` = edges per
    * customer, `supp_deg` = edges per supplier) — denormalized into
    * the tier exactly like a warehouse dimension carries its
    * aggregates: g1's outdeg window and g6's two degree joins become
    * column reads. Both windows ride the single hash(cust) exchange
    * the dedup already pays (supp_deg adds one more exchange at BUILD
    * time, paid once per snapshot, never per query).
    */
  def purchaseEdgesInline(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.loadParallel(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        (col("l_suppkey") + SuppOffset).cast("long").as("supp"))
      .repartition(col("cust"))
      .distinct()
      .withColumn("cust_deg", count(lit(1)).over(Window.partitionBy("cust")))
      .withColumn("supp_deg", count(lit(1)).over(Window.partitionBy("supp")))
  }

  /** Top-3 co-supply partners per supplier (by shared parts, ties to
    * the smaller partner id), canonical undirected edges `eu < ev`.
    * Columns: `eu`, `ev` (BIGINT). The hash(u) repartition clusters
    * (u,v) so the pair count AND the per-u top-3 window ride ONE
    * wedge-sized exchange (g2's measured fix, scale_probe exp ~1.0).
    */
  def cosupplyUndInline(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sp")).distinct()
    val shared = ps.as("a")
      .join(ps.as("b"), col("a.p") === col("b.p") && col("a.sp") =!= col("b.sp"))
      .select(col("a.sp").as("u"), col("b.sp").as("v"))
      .repartition(col("u"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("shared"))
    val w = Window.partitionBy("u").orderBy(col("shared").desc, col("v"))
    shared
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(least(col("u"), col("v")).cast("long").as("eu"),
        greatest(col("u"), col("v")).cast("long").as("ev"))
      .distinct()
  }

  // ---------------------------------------------------------------------
  // Served tier
  // ---------------------------------------------------------------------

  /** Store-served purchase edges: columns `cust`, `supp`. Registered
    * with the append-only merge, so daily part-file arrivals refresh
    * the tier at O(Δ + |edges|) instead of re-running the
    * history-sized lineitem⋈orders distinct ([[purchaseEdgesMerge]]);
    * any non-append drift still takes the full inline build. */
  def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    DerivedStore.servedIncremental(s, dir, "purchase", Seq("lineitem", "orders"),
      purchaseEdgesInline, purchaseEdgesMerge, numFiles = 8, sortKey = "cust")

  /** Append-only refresh of the purchase tier. New edges can only
    * come from NEW lineitem rows: a lineitem's order is present in
    * the same snapshot (the FK invariant q87 audits), so delta
    * lineitem ⋈ full orders is the complete new-pair set — the small
    * delta side broadcasts and the full distinct-over-history never
    * re-runs. Orders-only growth (orders whose lineitems haven't
    * landed yet) adds no edges by construction; their edges arrive
    * with a later lineitem delta.
    *
    * The FK invariant is ENFORCED, not assumed: if a delta ORDERS
    * file carries an order that pre-delta lineitems already
    * reference (lineitems landed before their order — the shape the
    * merge would permanently miss edges on, and q87 only audits after
    * the fact), the probe below detects it in one pruned pass over
    * lineitem's orderkey column against a broadcast of the delta
    * order keys, and the refresh takes the full rebuild instead.
    *
    * The degree columns are re-derived over the merged edge set with
    * two map-combined aggregates joined back — the honest O(|edges|)
    * tail without the two full-edge-set window SORTS the previous
    * form paid (the second of which re-sorted every historical edge
    * on supp each refresh). */
  private def purchaseEdgesMerge(s: SparkSession, dir: String,
                                 prev: DataFrame,
                                 deltas: Map[String, Seq[String]]): DataFrame = {
    val liPaths = deltas.getOrElse("lineitem", Seq.empty)
    val oPaths = deltas.getOrElse("orders", Seq.empty)
    if (oPaths.nonEmpty && deltaOrdersMatchOldLineitems(s, dir, oPaths, liPaths))
      purchaseEdgesInline(s, dir)
    else if (liPaths.isEmpty) prev // no new lineitems -> identical edge set
    else {
      val bare = prev.select("cust", "supp")
      val dLi = s.read.option("basePath", s"$dir/lineitem.parquet")
        .parquet(liPaths: _*).select("l_orderkey", "l_suppkey")
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val freshPairs = dLi.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("cust"),
          (col("l_suppkey") + SuppOffset).cast("long").as("supp"))
        .distinct()
        .join(bare, Seq("cust", "supp"), "left_anti")
      val edges = bare.union(freshPairs).registerCache()
      val cd = edges.groupBy("cust").agg(count(lit(1)).as("cust_deg"))
      val sd = edges.groupBy("supp").agg(count(lit(1)).as("supp_deg"))
      edges.join(cd, "cust").join(sd, "supp")
        .select("cust", "supp", "cust_deg", "supp_deg")
    }
  }

  /** True when a delta ORDERS file's keys are referenced by HISTORY
    * lineitem files (every lineitem file except this batch's own
    * deltas) — the FK-invariant violation under which an append-only
    * merge would miss edges a rebuild produces.
    *
    * The probe runs against ALL delta order keys (r11 advice fix): a
    * delta order covered by a delta LINEITEM does not prove history
    * exclusivity — if order O's lineitems landed in an earlier batch
    * (producing no edges, O being absent then) and O now arrives
    * together with one more of its own lineitems, a coverage-based
    * short-circuit would skip the probe and the early lineitems'
    * (cust, supp) edges would be permanently missing. Cost stays
    * bounded: the history scan is one pruned orderkey column with the
    * delta keys broadcast, range-filtered to the delta keys' min/max —
    * under production's monotonically growing order keys that pushed
    * predicate prunes nearly every history row group, so the sound
    * probe is delta-neighborhood I/O, not a full history read. */
  private def deltaOrdersMatchOldLineitems(s: SparkSession, dir: String,
                                           oPaths: Seq[String],
                                           liPaths: Seq[String]): Boolean = {
    val dOk = s.read.option("basePath", s"$dir/orders.parquet")
      .parquet(oPaths: _*).select(col("o_orderkey").as("k")).distinct()
      .registerCache() // feeds the bounds agg AND the history semi
    // delta-sized: one pass over the delta orders' key column; null
    // bounds mean the delta files carry no rows -> nothing to violate
    val bounds = dOk.agg(min("k").as("lo"), max("k").as("hi")).head()
    !bounds.isNullAt(0) && {
      val base = s"$dir/lineitem.parquet"
      val root = new org.apache.hadoop.fs.Path(base)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      // compare QUALIFIED paths: classify hands delta paths back as
      // "$dir/…" strings, which under a relative dir never equal the
      // listing's absolute URIs — a mismatch here would silently
      // reclassify the batch's own files as history
      def qual(p: String): String =
        fs.makeQualified(new org.apache.hadoop.fs.Path(p)).toString
      val qroot = fs.makeQualified(root)
      val deltaSet = liPaths.map(qual).toSet
      val hist = Seq.newBuilder[String]
      val it = fs.listFiles(qroot, true)
      while (it.hasNext) {
        val f = fs.makeQualified(it.next().getPath)
        val segs = f.toUri.getPath.stripPrefix(qroot.toUri.getPath).split('/')
        if (!segs.exists(seg => seg.startsWith("_") || seg.startsWith(".")) &&
            !deltaSet.contains(f.toString))
          hist += f.toString
      }
      val histPaths = hist.result()
      histPaths.nonEmpty &&
        !s.read.option("basePath", base).parquet(histPaths: _*)
          .select(col("l_orderkey").as("k"))
          .filter(col("k") >= bounds.get(0) && col("k") <= bounds.get(1))
          .join(broadcast(dOk), Seq("k"), "left_semi")
          .isEmpty
    }
  }

  /** Store-served co-supply undirected edges: columns `eu`, `ev`.
    * Full rebuild on any drift: the tier stores only each supplier's
    * TOP-3 partners, so an append-only merge would need the full
    * (u, v, shared) count table as its standing state — a different
    * (larger) artifact than what the consumers read. Until a consumer
    * needs incremental co-supply, the bounded wedge join stays the
    * per-snapshot cost. */
  def cosupplyUnd(s: SparkSession, dir: String): DataFrame =
    served(s, dir, "cosupply", Seq("lineitem"),
      cosupplyUndInline, numFiles = 4, sortKey = "eu")

  // ---------------------------------------------------------------------

  private def served(s: SparkSession, dir: String, name: String,
                     sources: Seq[String],
                     build: (SparkSession, String) => DataFrame,
                     numFiles: Int, sortKey: String): DataFrame =
    DerivedStore.served(s, dir, name, sources, build, numFiles, sortKey)
}
