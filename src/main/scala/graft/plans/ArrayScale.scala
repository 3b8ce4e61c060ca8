package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: element-wise scale of a double array —
  * `transform(v, x => x * f)` without the higher-order function (HOFs are
  * CodegenFallback: one boxed lambda call per element, and their presence
  * breaks the surrounding projection out of whole-stage codegen — the
  * interpreted-lambda class purged from the dot products in round r13 and
  * from the remaining array plumbing in r14, guide §4).
  *
  * Output elements are `x * f` with IEEE double multiplication — the exact
  * operation the HOF applied per element, so results are bit-identical.
  *
  * PRECONDITION (same caveat as [[DotProduct]]): input elements must be
  * non-null (every graft call site — fixed-dimension vectors). A null
  * element reads an undefined slot value here where the HOF would
  * NULL-propagate it.
  */
case class ArrayScale(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_array_scale"

  override def nullSafeEval(a: Any, f: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val s = f.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) * s; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, f) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) * $f;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayScale =
    copy(left = newLeft, right = newRight)
}

object ArrayScale {
  /** Column-API entry point. */
  def scale(a: Column, f: Column): Column =
    Bridge.column(ArrayScale(Bridge.expression(a), Bridge.expression(f)))
}
