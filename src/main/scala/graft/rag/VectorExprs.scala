package graft.rag

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the dot product of two
  * `array<double>` columns — the hot kernel of cosine scoring, LSH
  * bucketing and near-dup pair joins.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions are
  * CodegenFallback — every lambda step is interpreted, which at an
  * O(n²) pair join (millions of 64-element dots) dominates runtime.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen. The fold order (index 0..n-1, accumulator starts at 0.0)
  * is EXACTLY the HOF/oracle fold order, so scores stay bit-identical
  * to the DuckDB oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $a.getDouble(i) * $b.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftExprBridge._

  /** Column wrapper; callers must pass array<double> (cast upstream). */
  def dotProduct(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
