package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the SQ8 symmetric quantizer —
  * `transform(v, x => if (mx == 0) 0L else floor(x·127/mx + 0.5))` without
  * the higher-order function (CodegenFallback, one boxed lambda per
  * element over every corpus vector; guide §4, round r14). Element
  * arithmetic is exactly the HOF's: `(x * 127.0) / mx + 0.5` in IEEE
  * order, `Math.floor`, then the long conversion Spark's `floor` performs
  * — bit-identical codes.
  *
  * PRECONDITION (same caveat as [[DotProduct]]): non-null elements (the
  * SQ8 call site — fixed-dimension vectors). A null element reads an
  * undefined slot value here where the HOF would NULL-propagate it.
  */
case class ArrayQuantizeSq8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_array_quantize_sq8"

  override def nullSafeEval(a: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mx = m.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (mx == 0.0) 0L
        else java.lang.Math.floor(x.getDouble(i) * 127.0 / mx + 0.5).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ($m == 0.0) ? 0L
         |    : (long) java.lang.Math.floor($a.getDouble($i) * 127.0 / $m + 0.5);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayQuantizeSq8 =
    copy(left = newLeft, right = newRight)
}

object ArrayQuantizeSq8 {
  /** Column-API entry point. */
  def quantize(v: Column, mx: Column): Column =
    Bridge.column(ArrayQuantizeSq8(Bridge.expression(v), Bridge.expression(mx)))
}
