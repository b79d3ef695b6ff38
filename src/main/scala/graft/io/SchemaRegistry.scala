package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

/** Append-only versioned schema registry with compatibility gating —
  * the evolution-GOVERNANCE piece next to `core/SchemaUtil`'s
  * point-in-time drift gate (O6): the gate answers "does today's table
  * match yesterday's", the registry answers "is this PROPOSED schema
  * allowed to ship", before any data is written with it.
  *
  * Compatibility contract (the Avro/Confluent BACKWARD class, the one
  * a data lake actually needs): a reader built against the NEW schema
  * must read data written with every registered prior schema. That
  * forbids removing a column and forbids changing a column's type, and
  * permits adding columns only if they are nullable (old files simply
  * surface null — exactly the `mergeSchema` accretion case
  * `SchemaEvolutionSpec` pins on the read side).
  *
  * Storage: one JSON file per version (`v=N.json`, Spark's own
  * `StructType.json` — public, stable wire format) committed with the
  * write-then-rename pattern so a torn write can never register.
  * Versions are immutable; `register` is idempotent on an identical
  * re-submission (returns the existing version rather than minting a
  * duplicate).
  */
object SchemaRegistry {

  final case class Incompatibility(kind: String, column: String) {
    override def toString = s"$kind($column)"
  }

  /** Why `next` cannot read data written under `prior` — empty means
    * backward compatible. */
  def incompatibilities(prior: StructType, next: StructType): Seq[Incompatibility] = {
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val removedOrChanged = prior.fields.toSeq.flatMap { pf =>
      nextByName.get(pf.name) match {
        case None => Seq(Incompatibility("removed-column", pf.name))
        case Some(nf) if nf.dataType != pf.dataType =>
          Seq(Incompatibility("type-changed", pf.name))
        case Some(nf) if pf.nullable && !nf.nullable =>
          // Old files may hold nulls in this column; a reader that
          // declares it non-nullable cannot read them.
          Seq(Incompatibility("nullability-tightened", pf.name))
        case _ => Nil
      }
    }
    val priorNames = prior.fieldNames.toSet
    val addedNonNullable = next.fields.toSeq
      .filter(f => !priorNames.contains(f.name) && !f.nullable)
      .map(f => Incompatibility("added-non-nullable", f.name))
    removedOrChanged ++ addedNonNullable
  }

  private def versionFile(dir: String, v: Int) = Paths.get(dir, s"v=$v.json")

  def versions(dir: String): Seq[Int] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val stream = Files.list(p)
      try {
        stream.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("v=") && s.endsWith(".json") =>
            s.stripPrefix("v=").stripSuffix(".json").toInt }
          .toSeq.sorted
      } finally stream.close()
    }
  }

  def schemaAt(dir: String, v: Int): StructType =
    DataType.fromJson(new String(
      Files.readAllBytes(versionFile(dir, v)), StandardCharsets.UTF_8))
      .asInstanceOf[StructType]

  def latest(dir: String): Option[(Int, StructType)] =
    versions(dir).lastOption.map(v => v -> schemaAt(dir, v))

  /** Register `schema`, returning its version. Fails (and registers
    * nothing) if the proposal is not backward compatible with EVERY
    * prior version; re-registering the current schema is a no-op
    * returning the existing version. */
  def register(dir: String, schema: StructType): Int = {
    Files.createDirectories(Paths.get(dir))
    val vs = versions(dir)
    latest(dir) match {
      case Some((v, cur)) if cur == schema => v
      case _ =>
        val bad = vs.flatMap(v => incompatibilities(schemaAt(dir, v), schema)
          .map(i => s"v=$v:$i"))
        require(bad.isEmpty,
          s"schema rejected, not backward compatible: ${bad.mkString(", ")}")
        val v = vs.lastOption.getOrElse(0) + 1
        val tmp = Paths.get(dir, s".v=$v.json.tmp")
        Files.write(tmp, schema.json.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        Files.move(tmp, versionFile(dir, v),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        v
    }
  }
}
