package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class FormatsSpec extends SparkSpec {

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val orders = Tables.load(spark, sfDir, "orders")
    val path = tmpDir("orc") + "/orders"
    Formats.writeOrc(orders, path)
    val back = Formats.readOrc(spark, path)
    assert(back.count() == orders.count())
    assert(back.schema == orders.schema)
    // multiset equality both directions
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    val filtered = back.filter(col("o_custkey") === 7).select("o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)"),
      s"ORC scan did not push the filter:\n$plan")
  }

  test("binaryFile ingest: one row per file, payload pruned unless selected") {
    val dir = tmpDir("bin")
    val payloads = Seq("img-aa" -> "AAAA", "img-bb" -> "BBBBBB", "skip-me" -> "XX")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name + (if (name.startsWith("img")) ".jpg" else ".txt")),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    val all = Formats.readBinaryFiles(spark, dir)
    assert(all.count() == 3)
    // glob scopes the listing itself, not a post-filter
    val jpgs = Formats.readBinaryFiles(spark, dir, Some("*.jpg"))
    assert(jpgs.count() == 2)
    val sizes = jpgs.select(col("length")).collect().map(_.getLong(0)).sorted
    assert(sizes.toSeq == Seq(4L, 6L))
    val content = jpgs.filter(col("path").endsWith("img-bb.jpg"))
      .select(col("content")).head.getAs[Array[Byte]](0)
    assert(new String(content, java.nio.charset.StandardCharsets.UTF_8) == "BBBBBB")
    // metadata-only projection must not carry the payload column into
    // the scan — the 100 TB list-vs-read distinction
    val meta = jpgs.select("path", "length")
    val read = meta.queryExecution.executedPlan.toString
    assert(!read.contains("content"), read)
  }

  test("text round-trip: one line per document") {
    val docs = Tables.load(spark, sfDir, "documents").select(
      // newlines would break line-oriented storage: strip defensively
      regexp_replace(col("text"), "[\\r\\n]", " ").as("line"))
    val path = tmpDir("txt") + "/corpus"
    Formats.writeText(docs, "line", path)
    val back = Formats.readText(spark, path)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs.withColumnRenamed("line", "value")).isEmpty)
  }
}
