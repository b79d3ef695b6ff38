package graft.io

import java.nio.file.{Files, Path => JPath, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The append-only incremental-refresh path (`DerivedStore
  * .servedIncremental` + `GraphStore.purchaseEdgesMerge`): file-grain
  * drift classification routes daily part-file arrivals to the merge
  * callback — and the merged version must be row-identical to what a
  * full rebuild over the grown sources produces. Non-append drift
  * (an existing file touched) must still take the full build.
  *
  * Sources here are DIRECTORY-layout parquet (part files + _SUCCESS),
  * the production shape; the sf testdata's single-file tables always
  * classify as rewrite-on-change, which is the conservative fallback.
  */
class IncrementalTierSpec extends SparkSpec {

  /** Copy every DATA part file of `from` (a directory-layout parquet
    * write) into table dir `into` — the warehouse's append: new
    * immutable files landing next to untouched old ones. */
  private def appendParts(from: String, into: String): Unit = {
    val src = Paths.get(from)
    val dst = Paths.get(into)
    Files.list(src).forEach { f: JPath =>
      val n = f.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith("."))
        Files.move(f, dst.resolve(n)): Unit
    }
  }

  private def writeTable(df: DataFrame, dir: String, table: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$table.parquet")

  private def edges(dir: String): Set[(Long, Long, Long, Long)] =
    GraphStore.purchaseEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def inlineEdges(dir: String): Set[(Long, Long, Long, Long)] =
    GraphStore.purchaseEdgesInline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def lastMode: Option[String] = DerivedStore.lastBuild.map(_._2)

  test("append-only drift takes the merge path and equals a full rebuild; rewrite drift rebuilds") {
    val dir = tmpDir("incr-src")
    val prevRoot = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("incr-store")
    try {
      val orders = Tables.load(spark, sfDir, "orders").cache()
      val li = Tables.load(spark, sfDir, "lineitem").cache()
      // FK-consistent halves: an order and ALL its lineitems land in
      // the same batch (lineitems split by their order's key)
      val firstO = orders.filter(col("o_orderkey") % 2 === 0)
      val laterO = orders.filter(col("o_orderkey") % 2 =!= 0)
      val firstLi = li.filter(col("l_orderkey") % 2 === 0)
      val laterLi = li.filter(col("l_orderkey") % 2 =!= 0)

      writeTable(firstO, dir, "orders")
      writeTable(firstLi, dir, "lineitem")
      DerivedStore.lastBuild = None
      assert(edges(dir) == inlineEdges(dir))
      assert(lastMode.contains("full"), "first serve is a full build")
      val store = DerivedStore.storePath(dir, "purchase")
      assert(AtomicPublish.currentVersion(spark, store).contains(1L))

      // day 2: both tables grow by new part files only
      val stage = tmpDir("incr-delta")
      laterO.coalesce(1).write.parquet(s"$stage/o")
      laterLi.coalesce(1).write.parquet(s"$stage/li")
      appendParts(s"$stage/o", s"$dir/orders.parquet")
      appendParts(s"$stage/li", s"$dir/lineitem.parquet")
      DerivedStore.lastBuild = None
      val merged = edges(dir)
      assert(lastMode.contains("merge"), "append-only drift must take the merge path")
      assert(AtomicPublish.currentVersion(spark, store).contains(2L))
      assert(merged == inlineEdges(dir),
        "merged tier must be row-identical to a full rebuild over the grown sources")
      DerivedStore.lastBuild = None
      assert(edges(dir) == merged && lastMode.isEmpty, "fresh serve must not rebuild")

      // day 3: orders-only growth (their lineitems not landed yet) —
      // merge path, zero new edges
      val extraO = laterO.limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
      extraO.coalesce(1).write.parquet(s"$stage/o3")
      appendParts(s"$stage/o3", s"$dir/orders.parquet")
      DerivedStore.lastBuild = None
      assert(edges(dir) == merged, "orders without lineitems add no edges")
      assert(lastMode.contains("merge"))

      // rewrite drift: touch an existing data file -> full rebuild
      val aPart = Files.list(Paths.get(s"$dir/orders.parquet")).toArray
        .map(_.asInstanceOf[JPath])
        .find(p => !p.getFileName.toString.startsWith("_") &&
                   !p.getFileName.toString.startsWith(".")).get
      Files.setLastModifiedTime(aPart,
        java.nio.file.attribute.FileTime.fromMillis(
          Files.getLastModifiedTime(aPart).toMillis + 5000)): Unit
      DerivedStore.lastBuild = None
      assert(edges(dir) == merged)
      assert(lastMode.contains("full"), "non-append drift must take the full build")
      orders.unpersist(); li.unpersist(): Unit
    } finally prevRoot match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }
}
