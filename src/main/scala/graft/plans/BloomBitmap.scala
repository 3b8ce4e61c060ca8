package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** The production materialization of the Bloom/membership path: an
  * AGGREGATE that builds the m-bit bitmap itself (BinaryType output, OR-
  * merged partials — what crosses the network is m/8 bytes per partition,
  * never the key set), paired with [[BitmapTest]], a codegen expression
  * that probes one bit of that broadcast bitmap inside the whole-stage
  * loop. Together they turn the dedup_bloom_filter query's bit RELATION
  * (kept for oracle replay) into the constant-space artifact a 100 TB
  * screening pass actually ships: build once over the banned list,
  * broadcast m/8 bytes, probe map-side. BloomSpec pins verdict-for-verdict
  * equivalence between the two formulations.
  *
  * [[BitmapDistinct]] is the counting sibling; this one EMITS the bitmap,
  * which is why it exists separately (Spark has no aggregate that returns
  * its own buffer as a value).
  */
case class BitmapBuild(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(numBits > 0, s"numBits must be positive, got $numBits")

  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Long]
      if (pos < 0 || pos >= numBits)
        throw new IllegalArgumentException(
          s"graft_bitmap_build: position $pos outside [0, $numBits)")
      buffer.set(pos.toInt)
    }
    buffer
  }

  override def merge(b: java.util.BitSet, o: java.util.BitSet): java.util.BitSet = {
    b.or(o); b
  }

  /** The bitmap itself, little-endian-bit bytes (java.util.BitSet layout:
    * position p lives in byte p/8 at mask 1<<(p%8) — the layout BitmapTest
    * probes).
    */
  override def eval(buffer: java.util.BitSet): Any = buffer.toByteArray

  override def serialize(buffer: java.util.BitSet): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapBuild =
    copy(child = newChild)
}

object BitmapBuild {
  def bitmap(pos: Column, numBits: Int): Column =
    Bridge.column(
      BitmapBuild(Bridge.expression(pos), numBits).toAggregateExpression())

  private[graft] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_bitmap_build expects (posCol, numBits), got ${children.length} argument(s)")
    val n = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_bitmap_build: numBits must be an integer literal, got $other")
    }
    BitmapBuild(children.head, n)
  }
}

/** Bit probe over a [[BitmapBuild]] bitmap: true iff bit `pos` is set.
  * Positions beyond the (trailing-zero-trimmed) byte array read false —
  * BitSet.toByteArray drops trailing empty bytes, so an unset high bit has
  * no byte to probe. Codegen keeps the test inside the whole-stage loop.
  */
case class BitmapTest(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitmap_test"

  override def nullSafeEval(bmp: Any, p: Any): Any = {
    val bytes = bmp.asInstanceOf[Array[Byte]]
    val pos = p.asInstanceOf[Long]
    val b = (pos >> 3).toInt
    pos >= 0 && b < bytes.length && ((bytes(b) >> (pos & 7).toInt) & 1) != 0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bmp, pos) => {
      val b = ctx.freshName("byteIdx")
      s"""
        int $b = (int)($pos >> 3);
        ${ev.value} = $pos >= 0 && $b < $bmp.length
          && ((($bmp[$b]) >> (int)($pos & 7)) & 1) != 0;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapTest =
    copy(left = newLeft, right = newRight)
}

object BitmapTest {
  def test(bitmap: Column, pos: Column): Column =
    Bridge.column(BitmapTest(Bridge.expression(bitmap), Bridge.expression(pos)))

  private[graft] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_bitmap_test expects (bitmap, pos), got ${children.length} argument(s)")
    BitmapTest(children(0), children(1))
  }
}
