package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The materialized graph-edge tier: served == inline (row-equal),
  * builds exactly once per source fingerprint, and rebuilds when a
  * source table drifts. */
class GraphStoreSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  /** A private copy of the sf0.001 tables so mtime edits can't touch
    * the shared read-only corpus, under an isolated store root. */
  private def withIsolated[A](body: String => A): A = {
    val dir = tmpDir("graphstore-src")
    for (t <- Seq("lineitem", "orders")) {
      Files.copy(Paths.get(sfDir, s"$t.parquet"), Paths.get(dir, s"$t.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES): Unit
    }
    val prev = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("graphstore-root")
    try body(dir)
    finally prev match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }

  test("purchase tier: served row-equal to the inline form") {
    withIsolated { dir =>
      assert(rows(GraphStore.purchaseEdges(spark, dir)) ==
        rows(GraphStore.purchaseEdgesInline(spark, dir)))
    }
  }

  test("co-supply tier: served row-equal to the inline form") {
    withIsolated { dir =>
      assert(rows(GraphStore.cosupplyUnd(spark, dir)) ==
        rows(GraphStore.cosupplyUndInline(spark, dir)))
    }
  }

  test("tier columns: degrees match a recount; und is canonical eu<ev") {
    withIsolated { dir =>
      val p = GraphStore.purchaseEdges(spark, dir)
      import org.apache.spark.sql.functions._
      val bad = p.withColumn("cd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cust")))
        .withColumn("sd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("supp")))
        .filter(col("cd") =!= col("cust_deg") || col("sd") =!= col("supp_deg"))
      assert(bad.isEmpty)
      assert(GraphStore.cosupplyUnd(spark, dir).filter(col("eu") >= col("ev")).isEmpty)
    }
  }

  test("second serve reads, never rebuilds; source drift rebuilds") {
    withIsolated { dir =>
      GraphStore.purchaseEdges(spark, dir).count(): Unit
      val store = Paths.get(sys.props("graft.graphstore.dir"),
        dir.replace('/', '_').stripPrefix("_"), "purchase").toString
      def current = AtomicPublish.currentVersion(spark, store).get
      val v1 = current
      GraphStore.purchaseEdges(spark, dir).count(): Unit
      assert(current == v1, "re-serve must not publish a new version")
      // drift one source: mtime bump is enough for the fingerprint
      val li = Paths.get(dir, "lineitem.parquet")
      Files.setLastModifiedTime(li,
        java.nio.file.attribute.FileTime.fromMillis(
          Files.getLastModifiedTime(li).toMillis + 5000)): Unit
      GraphStore.purchaseEdges(spark, dir).count(): Unit
      assert(current == v1 + 1, "source drift must publish a new version")
      // the superseded version survives ONE refresh cycle (grace for
      // readers that resolved it just before the publish); a third
      // publish (second drift) finally sweeps it
      assert(Files.exists(Paths.get(store, s"v=$v1")),
        "previous version swept too early")
      Files.setLastModifiedTime(li,
        java.nio.file.attribute.FileTime.fromMillis(
          Files.getLastModifiedTime(li).toMillis + 5000)): Unit
      GraphStore.purchaseEdges(spark, dir).count(): Unit
      assert(current == v1 + 2)
      assert(!Files.exists(Paths.get(store, s"v=$v1")),
        "version two publishes old must age out")
      assert(Files.exists(Paths.get(store, s"v=${v1 + 1}")))
    }
  }
}
