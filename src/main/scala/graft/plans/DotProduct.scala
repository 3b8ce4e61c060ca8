package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: strict left-to-right dot product of two
  * double arrays — the codegen rung of the extension ladder (SURVEY.md,
  * "custom operators" (b)).
  *
  * Semantically identical to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,el)=>acc+el)` and to
  * DuckDB's `list_reduce(list_transform(a,(x,i)->x*b[i]),(acc,x)->acc+x)`
  * (same IEEE operation order, so bit-identical results) — but higher-order
  * functions are interpreted with per-element boxing, while this compiles
  * into the whole-stage-codegen loop: one fused `for` over the unsafe array
  * data, no allocation. ~10× on 64-dim vectors.
  *
  * PRECONDITION: equivalence holds for equal-length arrays with non-null
  * elements (every graft call site — fixed-dimension vectors). On unequal
  * lengths this truncates to the shorter array where the HOF NULL-pads
  * via zip_with; a null element reads an undefined slot value here and
  * NULL-propagates there.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
