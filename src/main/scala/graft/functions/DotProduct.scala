package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric arrays — the codegen'd
  * replacement for `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * ([[AnnOps.dot]]). Higher-order functions are interpreted per lambda
  * step and allocate a zipped intermediate array per row; this
  * expression generates one call into a static primitive loop and keeps
  * the projection inside WholeStageCodegen — on a 64-dim embedding scan
  * that is the difference between an interpreter dispatch per component
  * and a vectorizable multiply-add loop.
  *
  * Semantics are BIT-identical to the fold (and therefore to the DuckDB
  * oracle's `list_reduce`): a strict left-to-right double accumulation
  * from 0.0 — IEEE-754 addition is deterministic given the same order,
  * and `0.0 + x == x` for every x the fold can produce. Null parity with
  * `zip_with`: a null element or a length mismatch (zip_with pads the
  * shorter side with nulls) yields NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // mismatch/null-element → NULL
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""java.lang.Double $r = graft.functions.DotProduct.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = ($r == null);
         |${ev.value} = ($r == null) ? 0.0 : $r.doubleValue();""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Strict left-to-right multiply-accumulate; null on length mismatch
    * or null element (matching zip_with's null-padding semantics).
    */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
