package graft.io

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.core.Tables

/** Optimistic-concurrency publish: two writers racing for the same
  * version number serialize — one wins the rename, the loser's staged
  * bytes survive for a retry at the next number, and BOTH publishes
  * end up committed (no lost update).
  */
class OccPublishSpec extends SparkSpec {

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("racing writers serialize by version; loser retries without rewriting") {
    val table = tmpDir("occ") + "/nation"
    val a = Tables.load(spark, sfDir, "nation")        // 25 rows
    val b = Tables.load(spark, sfDir, "region")        // 5 rows
    // both writers stage, both believe next = 1
    val sA = AtomicPublish.stageVersion(a, table)
    val sB = AtomicPublish.stageVersion(b, table)
    assert(AtomicPublish.commitStaged(spark, table, sA, 1L))
    // B loses the race for v=1 — and its staging survives intact
    assert(!AtomicPublish.commitStaged(spark, table, sB, 1L))
    assert(fsOf(table).exists(sB), "loser's staging must survive for retry")
    // the retry (what publishVersionedOcc loops) lands at v=2
    assert(AtomicPublish.commitStaged(spark, table, sB, 2L))
    assert(AtomicPublish.currentVersion(spark, table).contains(2L))
    assert(AtomicPublish.readVersion(spark, table, 1L).count() == a.count())
    assert(AtomicPublish.readVersion(spark, table, 2L).count() == b.count())
  }

  test("publishVersionedOcc end-to-end: sequential writers, no leftover staging") {
    val table = tmpDir("occ2") + "/region"
    val df = Tables.load(spark, sfDir, "region")
    assert(AtomicPublish.publishVersionedOcc(df, table) == 1L)
    assert(AtomicPublish.publishVersionedOcc(df.limit(2), table) == 2L)
    assert(AtomicPublish.readCurrent(spark, table).count() == 2)
    val leftovers = fsOf(table).listStatus(new Path(table))
      .map(_.getPath.getName).filter(_.startsWith(".tx-"))
    assert(leftovers.isEmpty, s"staging not cleaned: ${leftovers.mkString(",")}")
  }
}
