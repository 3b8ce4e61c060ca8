package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Morton (Z-order) interleave of two
  * 16-bit cell coordinates — the codegen rung of the extension ladder
  * (SURVEY.md, "custom operators" (b)), written for the write-layout
  * planner (`etl_zorder_layout`).
  *
  * `graft_zorder(x, y)` maps cell (x, y) — each clamped to [0, 65535] —
  * to the 32-bit Morton code with x in the even bit positions and y in
  * the odd ones. Sorting rows by this code before a partitioned write
  * gives every output file a small axis-aligned footprint in BOTH
  * dimensions at once, so parquet min/max zone maps prune on either
  * predicate column — the layout trick single-column sorting cannot do
  * (sorting by x gives perfect x-locality and no y-locality). This is
  * the same layout Delta/Iceberg expose as OPTIMIZE ... ZORDER BY.
  *
  * The bit spread uses the classic parallel-prefix magic masks (public
  * "Interleave bits by Binary Magic Numbers" from Sean Anderson's Bit
  * Twiddling Hacks), 8 shift-mask steps total — branch-free, and inside
  * whole-stage codegen it compiles to straight-line long arithmetic: no
  * boxing, no loop, no allocation. The interpreted path (`nullSafeEval`)
  * and the generated code share one static helper so both paths are the
  * same arithmetic by construction.
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Saturate to the representable coordinate range [0, 65535]. Without
    * this, a negative or >16-bit input would wrap mod 65536 and alias to
    * an unrelated cell — silently breaking the locality the code exists
    * to provide.
    */
  private def clamp16(v: Long): Long =
    if (v < 0L) 0L else if (v > 0xffffL) 0xffffL else v

  /** Spread the 16 bits of `v` into the even bit positions. */
  private def spread16(v: Long): Long = {
    var x = v
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Morton code of (x, y), each saturating-clamped to [0, 65535]. */
  def interleave(x: Long, y: Long): Long =
    spread16(clamp16(x)) | (spread16(clamp16(y)) << 1)

  /** Column-API entry point. */
  def zorder(x: Column, y: Column): Column =
    Bridge.column(ZOrder(Bridge.expression(x), Bridge.expression(y)))
}
