package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<bigint>` columns — the
  * int8-domain companion of [[DotProduct]], used by
  * [[AnnOps.annInt8Topk]]'s candidate scan. Integer addition is
  * associative and overflow-free here (|dot| ≤ 64·127² < 2³⁰ for int8
  * components), so unlike the double kernel there is no accumulation-
  * order caveat at all: any evaluation order is bit-identical to the
  * interpreted `aggregate(zip_with(...))` fold and to DuckDB's
  * `list_reduce`. One static primitive loop inside WholeStageCodegen —
  * this scan is the query's hot path, and integer MACs over sequential
  * longs are exactly what the 4× scan-throughput claim is about.
  * Null parity with zip_with: null element or length mismatch → NULL.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // mismatch/null-element → NULL
  override def prettyName: String = "int_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("idot")
      s"""java.lang.Long $r = graft.functions.IntDotProduct.compute($a, $b);
         |${ev.isNull} = ($r == null);
         |${ev.value} = ($r == null) ? 0L : $r.longValue();""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {

  /** Multiply-accumulate over longs; null on length mismatch or null
    * element (matching zip_with's null-padding semantics).
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
