package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential left-fold dot product of two double arrays as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions evaluate their lambdas interpreted, one boxed step per
  * element — on an O(n²) similarity join (pairs × 64 dims) that was the
  * single largest line in the whole bench. The generated loop below reads
  * primitives straight out of `ArrayData` with no allocation, and joins
  * the surrounding whole-stage-codegen span instead of breaking it.
  *
  * Summation order is strictly left-to-right — bit-identical to the HOF
  * fold it replaces and to the DuckDB oracle's `list_reduce` — so
  * swapping it in changes nothing observable, only the cost.
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_fold"

  // Null semantics mirror aggregate(zip_with(a,b,*),0,+) exactly:
  // zip_with pads a length mismatch with nulls and a null element nulls
  // its product, so the whole sum becomes NULL — therefore: any length
  // mismatch or null element ⇒ NULL (as in the DuckDB oracle's list
  // arithmetic).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

object DotFold {
  /** Column-level entry point: `dotFold(a, b)` = Σᵢ a[i]·b[i], folded
    * left-to-right.
    */
  def dotFold(a: Column, b: Column): Column =
    Bridge.toColumn(DotFold(Bridge.toExpression(a), Bridge.toExpression(b)))
}
