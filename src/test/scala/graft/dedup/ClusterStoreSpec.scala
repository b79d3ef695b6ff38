package graft.dedup

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The materialized dup-cluster tier: served == inline (row-equal)
  * for both label sets, under an isolated store root. */
class ClusterStoreSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)

  private def withIsolated[A](body: String => A): A = {
    val dir = tmpDir("clusterstore-src")
    for (t <- Seq("documents", "embeddings")) {
      Files.copy(Paths.get(sfDir, s"$t.parquet"), Paths.get(dir, s"$t.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES): Unit
    }
    val prev = sys.props.get("graft.graphstore.dir")
    sys.props("graft.graphstore.dir") = tmpDir("clusterstore-root")
    try body(dir)
    finally prev match {
      case Some(v) => sys.props("graft.graphstore.dir") = v
      case None => sys.props.remove("graft.graphstore.dir"): Unit
    }
  }

  test("lsh-components tier: served row-equal to the inline convergence loop") {
    withIsolated { dir =>
      val served = rows(ClusterStore.lshComponents(spark, dir))
      assert(served.nonEmpty && served == rows(ClusterStore.lshComponentsInline(spark, dir)))
    }
  }

  test("emb-components tier: served row-equal to the inline convergence loop") {
    withIsolated { dir =>
      val served = rows(ClusterStore.embComponents(spark, dir))
      assert(served.nonEmpty && served == rows(ClusterStore.embComponentsInline(spark, dir)))
    }
  }
}
