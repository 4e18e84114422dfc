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
  * sketch, update cost O(log k) via a bounded ordered MULTISET (a
  * TreeMap item → multiplicity) that evicts one copy of the current
  * worst item past capacity. The multiset matters: a plain TreeSet
  * silently collapses physically identical input rows into one slot,
  * which is top-k-WRONG the moment a caller's priority is not injective
  * per row (sample_reservoir's salted hash happens to be injective on
  * doc_id, but the operator must not depend on its caller's key
  * discipline — ADVICE r9 #1).
  *
  * Ordering is (priority DESC, doc_id ASC, w ASC) — a total order over
  * the full item so eval is deterministic and only byte-identical rows
  * share a multiset key (where survivor identity is immaterial and only
  * the count matters, which the multiset preserves).
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
  extends TypedImperativeAggregate[TopKPriorityAgg.Buffer] {

  import TopKPriorityAgg.{Buffer, Item}

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

  override def createAggregationBuffer(): Buffer = new Buffer

  private def add(buf: Buffer, it: Item): Unit =
    if (buf.total < k) {
      buf.m.merge(it, 1, (a, b) => a + b)
      buf.total += 1
    } else {
      val worst = buf.m.lastKey()
      if (it.compareTo(worst) < 0) {
        // strictly better than the current worst (total order ⇒ it is a
        // DIFFERENT key), so insert one copy and evict one of the worst
        buf.m.merge(it, 1, (a, b) => a + b)
        val c = buf.m.get(worst)
        if (c == 1) buf.m.remove(worst) else buf.m.put(worst, c - 1)
      }
    }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      add(buf, Item(row.getLong(0), row.getInt(1), row.getDouble(2)))
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var i = 0
      while (i < e.getValue) { add(buf, e.getKey); i += 1 }
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = 0
      while (c < e.getValue) {
        out(i) = new GenericInternalRow(
          Array[Any](e.getKey.docId, e.getKey.w, e.getKey.priority))
        i += 1; c += 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.m.size)
    bb.putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.docId); bb.putInt(e.getKey.w)
      bb.putDouble(e.getKey.priority); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val item = Item(bb.getLong, bb.getInt, bb.getDouble)
      val c = bb.getInt
      buf.m.put(item, c)
      buf.total += c
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
  /** (priority DESC, doc_id ASC, w ASC) — TreeMap.firstKey is the best
    * item, .lastKey the current eviction candidate. Total over all three
    * fields so distinct rows never share a multiset key.
    */
  final case class Item(docId: Long, w: Int, priority: Double)
      extends Comparable[Item] {
    override def compareTo(o: Item): Int = {
      val c = java.lang.Double.compare(o.priority, priority)
      if (c != 0) c
      else {
        val d = java.lang.Long.compare(docId, o.docId)
        if (d != 0) d else java.lang.Integer.compare(w, o.w)
      }
    }
  }

  /** Ordered multiset: item → multiplicity, plus the total item count
    * (≤ k by the add/evict invariant). Identical rows each keep a slot.
    */
  final class Buffer {
    val m = new java.util.TreeMap[Item, Int]()
    var total: Int = 0
  }
}
