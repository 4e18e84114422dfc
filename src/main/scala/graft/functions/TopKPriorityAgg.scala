package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-priority as a native [[TypedImperativeAggregate]] —
  * the k-bounded-buffer twin of [[KmvSketchAgg]] for the priority-
  * sampling row ([[PrepOps.sampleReservoir]]): the aggregation state is
  * the k highest-priority (doc_id, w, priority) items seen, so every
  * map task ships at most k items per group across the shuffle and the
  * aggregate never buffers a stratum (a `slice(sort_array(collect_list
  * ...))` formulation is top-k-correct but its PARTIAL buffer is the
  * whole group pre-slice — one task's rows for one language held in
  * memory and shipped in the exchange, which is exactly the unbounded
  * footprint this operator exists to avoid at skewed strata).
  *
  * "Top k of a union is computable from top k of each part", so the
  * buffer is fully mergeable — same partial/merge discipline as the KMV
  * sketch, update cost O(log k) via a bounded TreeSet that evicts the
  * current worst item past capacity.
  *
  * Ordering is (priority DESC, doc_id ASC) — ties on priority cannot
  * occur for distinct docs (the salted content-free hash is injective
  * on doc_id within 2⁶⁰) but the total order keeps eval deterministic
  * anyway.
  *
  * Evaluates to the rank-ordered array<struct<doc_id,w,priority>> so
  * downstream is a plain `posexplode` and the DuckDB oracle states the
  * textbook per-stratum `row_number` window over the same priorities.
  */
case class TopKPriorityAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[TopKPriorityAgg.Item]] {

  import TopKPriorityAgg.Item

  require(k >= 1, "top-k needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("priority", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_priority"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 &&
        s(0).dataType == LongType && s(1).dataType == IntegerType &&
        s(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<bigint,int,double>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[Item] =
    new java.util.TreeSet[Item]()

  private def add(buf: java.util.TreeSet[Item], it: Item): Unit =
    if (buf.size < k) { buf.add(it); () }
    else if (it.compareTo(buf.last) < 0 && buf.add(it)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[Item],
      input: InternalRow): java.util.TreeSet[Item] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      add(buf, Item(row.getLong(0), row.getInt(1), row.getDouble(2)))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Item],
      other: java.util.TreeSet[Item]): java.util.TreeSet[Item] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Item]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.docId, e.w, e.priority))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Item]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 20 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.docId); bb.putInt(e.w); bb.putDouble(e.priority)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Item] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add(Item(bb.getLong, bb.getInt, bb.getDouble))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPriorityAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPriorityAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPriorityAgg =
    copy(child = newChildren.head)
}

object TopKPriorityAgg {
  /** (priority DESC, doc_id ASC) — TreeSet.first is the best item,
    * .last the current eviction candidate.
    */
  final case class Item(docId: Long, w: Int, priority: Double)
      extends Comparable[Item] {
    override def compareTo(o: Item): Int = {
      val c = java.lang.Double.compare(o.priority, priority)
      if (c != 0) c else java.lang.Long.compare(docId, o.docId)
    }
  }
}
