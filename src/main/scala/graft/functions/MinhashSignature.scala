package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the K-permutation minhash
  * signature of a shingle array in ONE pass — the codegen'd replacement
  * for the `aggregate`/`transform` in-array fold ([[DedupOps]]).
  *
  * Higher-order functions don't participate in whole-stage codegen: the
  * fold is interpreted per lambda step and allocates a fresh K-element
  * array per shingle. This expression generates a call into a static
  * loop over a primitive long[K] accumulator — no per-step allocation,
  * no interpreter dispatch — and keeps the surrounding projection inside
  * WholeStageCodegen. Hash semantics are bit-identical to
  * [[SharedHash.h64]] (`conv(substring(md5(x),1,15),16,10)` = the md5
  * digest's first 60 bits), so the DuckDB oracle for every minhash query
  * is unchanged — the native path is a drop-in physical swap.
  */
case class MinhashSignature(child: Expression, k: Int, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> or array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  /** array<bigint> input = shingles already hashed to `h64(s) mod p`
    * upstream (the shared-checkpoint verify pipeline computes the hash
    * set once for signature AND Jaccard); skip the md5 and permute the
    * given hashes — bit-identical to hashing here, since upstream uses
    * the same [[SharedHash.h64]] mod p.
    */
  private def hashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      if (hashed) MinhashSignature.computeHashed(input.asInstanceOf[ArrayData], k, p)
      else MinhashSignature.compute(input.asInstanceOf[ArrayData], k, p))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fn = if (hashed) "computeHashed" else "compute"
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinhashSignature.$fn($c, $k, ${p}L));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {

  /** One pass over the shingles, K running minima in a primitive array.
    * Permutation family matches the SQL fold exactly:
    * `((2j+1)·h + j·912367 + 341) mod p` over `h = h64(s) mod p`.
    */
  def compute(arr: ArrayData, k: Int, p: Long): Array[Long] = {
    val acc = Array.fill(k)(p)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = SharedHash.h64Jvm(s.getBytes) % p
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1L) * h + j.toLong * 912367L + 341L) % p
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    acc
  }

  /** Same permutation family over pre-hashed shingles (`h64(s) mod p`
    * computed upstream) — no md5 here.
    */
  def computeHashed(arr: ArrayData, k: Int, p: Long): Array[Long] = {
    val acc = Array.fill(k)(p)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1L) * h + j.toLong * 912367L + 341L) % p
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    acc
  }
}
