package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns — the scoring hot
  * loop of the similarity operators (cosine = dot / norms). The
  * built-in form `aggregate(zip_with(a, b, *), 0d, +)` materializes the
  * zipped array per row and dispatches two lambdas per element; this is
  * one fused primitive loop over the two ArrayData buffers. Same
  * left-to-right accumulation order, so results are bitwise identical
  * (asserted in OperatorsSpec) and oracle parity is unaffected.
  *
  * Null handling follows BinaryExpression's null-intolerant default
  * (null input ⇒ null), matching the built-in composition — including
  * on length-mismatched inputs, where zip_with null-pads the shorter
  * side and the sum poisons to NULL: this expression returns null there
  * too (it never silently truncates).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(new DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
