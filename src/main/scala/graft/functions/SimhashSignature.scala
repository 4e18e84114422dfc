package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the [[SimhashSignature.Bits]]-bit
  * (60-bit) SimHash of a word array in ONE pass — the structural
  * replacement for the explode → per-bit-conditional-sum groupBy in
  * [[DedupOps.simhashSigs]]. 60 bits because the engine-portable
  * [[SharedHash.h64]] carries exactly 60 bits of entropy — a wider
  * signature would have constant (dead) high bits.
  *
  * The aggregation form shuffles one row PER WORD and keeps 60 agg
  * buffers per document; this expression folds the whole ±1 bit vote
  * into a primitive int[60] inside the scan projection, so signature
  * computation becomes a pure map — no explode, no shuffle, and the
  * downstream band join starts directly from the scan. Votes are
  * integer counts over the same per-word [[SharedHash.h64Jvm]] values
  * the SQL form hashes, and integer addition is order-independent, so
  * the result is bit-identical to the aggregation (and the DuckDB
  * oracle) including duplicate and empty-string words.
  */
case class SimhashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(input: Any): Any =
    SimhashSignature.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashSignature.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}

object SimhashSignature {

  /** Signature width — 60 usable bits of [[SharedHash.h64]]. */
  val Bits = 60

  /** ±1 majority vote per bit over the word hashes, packed little-endian:
    * bit j of the result is set iff strictly more words have bit j set
    * than clear — exactly `sum(CASE WHEN (h>>j)&1=1 THEN 1 ELSE -1) > 0`.
    */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = SharedHash.h64Jvm(s.getBytes)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
