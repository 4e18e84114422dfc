package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructType}

/** Native Catalyst expression computing a vector's product-quantization
  * codes against the broadcast codebook row in ONE pass — the codegen'd
  * replacement for the zip_with/aggregate argmin fold in
  * [[AnnOps.pqCodes]]. The fold form dispatches ~M×K interpreted lambda
  * steps per row (16 subspaces × 64 candidates = 1024, each wrapping a
  * [[DotProduct]] eval); this expression runs the whole
  * normalize→slice→argmin pipeline in a primitive JVM loop inside the
  * scan projection.
  *
  * Semantics are BIT-identical to the fold (PqCodesSpec A/Bs them):
  * nrm = sqrt(sequential Σe_i²), sv_i = (double)e_i / nrm, per subspace
  * s2 = sequential Σsv_i², per candidate d2 = s2 + c2 − 2·(sequential
  * Σ sv_i·cvec_i), strict `<` argmin in cid order (lowest cid wins
  * ties) — every accumulation left-to-right from 0.0, every combine in
  * the same IEEE order as the Column form and the DuckDB oracle.
  */
case class PqCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  private def embOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  // array< array< struct<cid:int, cvec:array<double>, c2:double> > >
  private def cballOk(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(s: StructType, _), _) if s.length == 3 =>
      s(0).dataType == IntegerType &&
        s(1).dataType.isInstanceOf[ArrayType] &&
        s(1).dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        s(2).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (embOk(left.dataType) && cballOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<struct<cid,cvec,c2>>>), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(emb: Any, cball: Any): Any = {
    val codes = PqCodes.compute(
      emb.asInstanceOf[ArrayData], cball.asInstanceOf[ArrayData], isFloat)
    if (codes == null) null else new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, cb) => {
      val raw = ctx.freshName("rawCodes")
      s"""int[] $raw = graft.functions.PqCodes.compute($e, $cb, $isFloat);
         |if ($raw == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($raw); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

object PqCodes {

  /** See the class doc for the exact IEEE-order contract; every loop
    * below is the sequential fold the Column/DuckDB forms run. Returns
    * null when any subspace picks no candidate — an empty candidate
    * list, or a zero-norm embedding (NaN subvectors make every d2 NaN
    * and `NaN < best` is false) — rather than emitting the cid-0
    * sentinel a downstream ADC would silently index with.
    */
  def compute(emb: ArrayData, cball: ArrayData, embFloat: Boolean): Array[Int] = {
    val dim = emb.numElements()
    val m = cball.numElements()
    val sub = dim / m
    val e = new Array[Double](dim)
    var acc = 0.0
    var i = 0
    while (i < dim) {
      e(i) = if (embFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      i += 1
    }
    i = 0
    while (i < dim) { acc += e(i) * e(i); i += 1 }
    val nrm = math.sqrt(acc)
    val codes = new Array[Int](m)
    val sv = new Array[Double](sub)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < sub) { sv(j) = e(mi * sub + j) / nrm; j += 1 }
      var s2 = 0.0
      j = 0
      while (j < sub) { s2 += sv(j) * sv(j); j += 1 }
      val cands = cball.getArray(mi)
      var best = Double.MaxValue
      var bestCid = 0
      var found = false
      var k = 0
      val nc = cands.numElements()
      while (k < nc) {
        val c = cands.getStruct(k, 3)
        val cvec = c.getArray(1)
        var dotv = 0.0
        var x = 0
        while (x < sub) { dotv += sv(x) * cvec.getDouble(x); x += 1 }
        val d2 = s2 + c.getDouble(2) - 2.0 * dotv
        if (d2 < best) { best = d2; bestCid = c.getInt(0); found = true }
        k += 1
      }
      if (!found) return null
      codes(mi) = bestCid
      mi += 1
    }
    codes
  }
}
