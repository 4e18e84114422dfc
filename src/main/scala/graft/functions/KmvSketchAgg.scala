package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch as a native
  * [[TypedImperativeAggregate]] — the theta-sketch family's simplest
  * member (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07). The aggregation state is the
  * k smallest DISTINCT hash values seen; because "k smallest of a
  * union" is computable from "k smallest of each part", the sketch is
  * fully mergeable: Catalyst's partial aggregation collapses every map
  * task to one ≤k-element buffer before the shuffle, and the same merge
  * combines sketches across tables, days, or streaming micro-batches.
  *
  * Distinct-count estimate from a saturated sketch: with hashes uniform
  * in [0, M), the k-th smallest sits near k·M/D, so D̂ = (k-1)·M/h_k
  * (the unbiased form). An UNSATURATED sketch (|buffer| < k) IS the
  * distinct hash set — the estimate is exact. Set operations follow
  * from the same structure: the k smallest of K(A) ∪ K(B) is a valid
  * sketch of A ∪ B, and every element of it is ≤ both inputs' k-th
  * minima, so membership in K(A)/K(B) decides membership in A/B —
  * which yields intersection and Jaccard estimates with all-integer
  * arithmetic ([[SketchOps.kmvJaccard]]).
  *
  * Evaluates to the sorted ascending array<long> of retained hashes so
  * downstream estimators are plain Catalyst array functions — and so
  * the DuckDB oracle can reproduce the sketch exactly with
  * `row_number() OVER (ORDER BY h) <= k` over the same
  * [[SharedHash.h64]] values (deterministic, unlike Spark's built-in
  * HLL++/approx aggregates).
  *
  * The buffer is a bounded TreeSet: inserts past capacity evict the
  * current maximum, so update cost is O(log k) with k a small constant
  * — the aggregate never holds more than k longs per group regardless
  * of input size.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
