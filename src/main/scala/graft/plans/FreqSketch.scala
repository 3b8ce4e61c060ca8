package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native aggregate — the heavy-
  * hitters rung of the extension ladder (alongside BitmapDistinct and
  * BloomBitmap). Each partition maintains at most [[k]] counters; partials
  * merge associatively (counter sums, then the (k+1)-th largest value
  * subtracted from all — the mergeable-summaries construction, Agarwal et
  * al. 2012), so what crosses the network per group per partition is ≤ k
  * (item, count) pairs no matter how many tokens the partition saw. The
  * guarantee that makes a downstream EXACT answer possible: every item
  * with true frequency > n/(k+1) is present in the final sketch. A
  * verification pass that semi-joins the stream to the ≤ k candidates and
  * exactly counts only those therefore reproduces the exact frequent set
  * for any threshold t > n/(k+1) — approximate candidate generation, exact
  * verified output, the same two-phase shape as the dedup family.
  *
  * The candidate SET is what the guarantee covers; per-item counter values
  * (and which sub-threshold decoys survive) depend on input order, so
  * eval() returns only the item array, sorted, and callers must re-count
  * exactly — never report the sketch's internal counters.
  *
  * Reference context: the reference profiles value frequencies by exact
  * groupBy (postgres.py row iterators); this is the shape that survey
  * takes when the column is 100 TB of tokens — the token stream never
  * shuffles, only k-entry summaries do.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0 && k <= 100000, s"counter budget must be in (0, 100000], got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic decrement-all: amortized O(1) — each overflow pays down
          // k+1 prior increments; items reaching 0 leave the sketch
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop the non-positive
      // remainder: the merged summary keeps the n/(k+1) guarantee
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) => out.writeUTF(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  // (return type inferred: AbstractDataType itself is sql-package-private)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column-API entry point: candidate heavy-hitter items of `c` under a
    * budget of `k` counters (superset of every item with freq > n/(k+1)).
    */
  def candidates(c: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(c), k).toAggregateExpression())

  /** SQL builder: `graft_freq_sketch(col, kLiteral)`. */
  private[graft] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_freq_sketch expects (col, k), got ${children.length} argument(s)")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_freq_sketch: k must be an integer literal, got $other")
    }
    MisraGries(children.head, k)
  }
}
