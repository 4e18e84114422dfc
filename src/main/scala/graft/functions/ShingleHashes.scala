package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression hashing a document's shingles to their
  * distinct `h64 mod p` set in ONE primitive pass.
  *
  * Two input modes:
  *  - `gram = 0`: the input IS the shingle strings — replaces
  *    `array_distinct(transform(shingles, s => h64(s) % p))`, whose
  *    higher-order lambda dispatches the interpreted md5→conv→substring
  *    Column chain once per shingle;
  *  - `gram = n > 0`: the input is the WORD array and the expression
  *    hashes each n-word shingle `"w_i w_{i+1} … w_{i+n-1}"` directly
  *    from the word bytes — the shingle STRINGS are never materialized,
  *    eliminating the per-shingle `concat_ws` lambda and its string
  *    allocations (measured: string construction dominated the hashed
  *    verify pipeline at 100× corpus scale once hashing went native).
  *
  * Distinctness keeps FIRST-OCCURRENCE order, exactly like
  * `array_distinct`, so the downstream exact-dup collapse groups on
  * identical arrays for identical shingle sequences. Hash semantics are
  * bit-identical to [[SharedHash.h64]] of the space-joined shingle
  * (ShingleHashesSpec A/Bs both modes against the Column form), so
  * every DuckDB oracle formula is unchanged.
  */
case class ShingleHashes(child: Expression, p: Long, gram: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      if (gram > 0) ShingleHashes.computeGrams(input.asInstanceOf[ArrayData], gram, p)
      else ShingleHashes.compute(input.asInstanceOf[ArrayData], p))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val call =
        if (gram > 0) s"computeGrams($c, $gram, ${p}L)" else s"compute($c, ${p}L)"
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes.$call);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Hash + first-occurrence dedup in one pass; null elements are
    * skipped (the Column form's `h64(null) % p` is null and
    * `array_distinct` would keep one null — shingle arrays are built
    * from concat_ws and contain none).
    */
  def compute(arr: ArrayData, p: Long): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, n * 2))
    var m = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = SharedHash.h64Jvm(s.getBytes) % p
        if (seen.add(h)) { out(m) = h; m += 1 }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** n-gram mode: hash `"w_i w_{i+1} … w_{i+n-1}"` for every window of
    * the word array, assembling the bytes in a reusable buffer — byte-
    * identical input to md5 as the space-joined string, with zero string
    * allocation. Null words contribute their empty rendering the same
    * way `concat_ws` drops nothing here (split never yields nulls).
    */
  def computeGrams(words: ArrayData, gram: Int, p: Long): Array[Long] = {
    val n = words.numElements()
    if (n < gram) return Array.emptyLongArray
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      bytes(i) = if (w == null) Array.emptyByteArray else w.getBytes
      i += 1
    }
    val nOut = n - gram + 1
    val out = new Array[Long](nOut)
    val seen = new java.util.HashSet[java.lang.Long](Math.max(16, nOut * 2))
    var m = 0
    var start = 0
    var buf = new Array[Byte](64)
    while (start <= n - gram) {
      var len = gram - 1 // separators
      var j = 0
      while (j < gram) { len += bytes(start + j).length; j += 1 }
      if (buf.length < len) buf = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < gram) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val b = bytes(start + j)
        System.arraycopy(b, 0, buf, off, b.length)
        off += b.length
        j += 1
      }
      val h = SharedHash.h64Jvm(buf, len) % p
      if (seen.add(h)) { out(m) = h; m += 1 }
      start += 1
    }
    java.util.Arrays.copyOf(out, m)
  }
}
