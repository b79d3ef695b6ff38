package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.util.TreeSet

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2.11's optional exact-semantics `listagg(distinct …, delim)`
  * (`Elastic_indexing.py:135,144` uses Redshift's) as a Catalyst
  * `TypedImperativeAggregate`: a sorted distinct set accumulated
  * per-partition and merged — the deterministic ordering the engine
  * pins everywhere (Redshift leaves it unspecified; we sort).
  *
  * The built-in composition `array_join(sort_array(collect_set(c)), d)`
  * is plan-equivalent and is what the oracle queries use; this native
  * aggregate exists for the SQL surface (`listagg(col, ',')` via
  * [[GraftExtensions]]) and as the §2.11(b) capability demonstration.
  * Partial aggregation works: update folds rows into a TreeSet,
  * merge unions the sets, so the shuffle carries one buffer per group
  * per partition, not the rows.
  */
case class ListAgg(
    child: Expression,
    delimiter: String = ",",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[String]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TreeSet[String] = new TreeSet[String]()

  override def update(buffer: TreeSet[String], input: InternalRow): TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] = {
    b1.addAll(b2); b1
  }

  override def eval(buffer: TreeSet[String]): Any =
    UTF8String.fromString(buffer.asScala.mkString(delimiter))

  override def serialize(buffer: TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buffer.size())
    buffer.asScala.foreach(oos.writeUTF)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[String] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val set = new TreeSet[String]()
    (0 until n).foreach(_ => set.add(ois.readUTF()))
    set
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "listagg"

  override def withNewMutableAggBufferOffset(offset: Int): ListAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ListAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ListAgg =
    copy(child = newChild)
}

object ListAgg {
  import org.apache.spark.sql.GraftColumnBridge

  /** DataFrame-API surface: `df.agg(ListAgg.listagg(col("x"), ","))`. */
  def listagg(c: Column, delimiter: String = ","): Column =
    GraftColumnBridge.column(
      ListAgg(GraftColumnBridge.expression(c), delimiter).toAggregateExpression())

  /** SQL builder for FunctionRegistry injection. */
  def builder(args: Seq[Expression]): Expression = args match {
    case Seq(child) => ListAgg(child).toAggregateExpression()
    case Seq(child, Literal(d: UTF8String, StringType)) =>
      ListAgg(child, d.toString).toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "listagg(col[, delimiter]) expects 1 or 2 arguments")
  }
}
