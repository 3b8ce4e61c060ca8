package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: element-wise difference of two double
  * arrays — `zip_with(a, b, (x, y) => x - y)` without the higher-order
  * function (CodegenFallback, one boxed lambda per element; guide §4,
  * round r14 — the IVF-PQ residual computation ran it over every corpus
  * vector). IEEE subtraction per element, so results are bit-identical
  * to the HOF on its defined domain.
  *
  * PRECONDITION (same caveat as [[DotProduct]]): equal-length arrays with
  * non-null elements (the residual call sites — fixed-dimension vectors
  * minus fixed-dimension centroids). On unequal lengths this truncates to
  * the shorter array where `zip_with` NULL-pads; a null element reads an
  * undefined slot value here and NULL-propagates there.
  */
case class ArraySub(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_array_sub"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) - $b.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySub =
    copy(left = newLeft, right = newRight)
}

object ArraySub {
  /** Column-API entry point. */
  def sub(a: Column, b: Column): Column =
    Bridge.column(ArraySub(Bridge.expression(a), Bridge.expression(b)))
}
