package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-key top-k as a first-class operator — the whole-operator rung (c) of
  * the extension ladder: custom LogicalPlan + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions.
  *
  * Why not `row_number().over(Window.partitionBy(keys).orderBy(...)) <= k`?
  * The window plan SORTS every key's full row set (shuffle + per-partition
  * sort of ALL rows) just to discard everything past rank k. This operator
  * keeps a bounded heap of k rows per key and never sorts the input:
  *
  *   - a PARTIAL pass runs before the shuffle (map-side, like partial
  *     aggregation), cutting each partition to ≤ k rows per key — so the
  *     exchange moves O(keys·k) rows, not O(n);
  *   - the FINAL pass re-applies the same bound after the shuffle.
  *
  * State is aggregation-buffer-shaped (k rows per distinct key per task).
  * Output order within a key is unspecified — callers needing ranked or
  * sorted output sort the ≤ k·keys survivors, which is the cheap part.
  */
case class TopKPerKeyPlan(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical bounded-heap top-k. `partial = true` runs map-side with no
  * distribution requirement; `partial = false` demands clustering on the
  * keys (EnsureRequirements inserts the single hash exchange between the
  * two, exactly like partial/final aggregation).
  */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // rows are only filtered, never moved: downstream operators keyed on the
  // same columns (e.g. a ranking window) can reuse the exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a max-heap under `ordering` — head is the WORST retained
      // row, so a better row evicts it in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && it.hasNext) current = it.next().iterator
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Column-API front door. */
object TopK {
  /** Top `k` rows per `keyCols` group under `orderCols` (first = best).
    * Output order is unspecified; sort the survivors if needed.
    *
    * Determinism contract (mirroring AsofJoin's note): `orderCols` must be
    * a TOTAL order within each key. The bounded heap admits only strictly
    * better rows, so among order-tied rows the retained set depends on
    * input/partition order and can differ from a row_number formulation.
    * Append a unique id as the last order column to break ties.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val keys = keyCols.map(c => Bridge.catalystExpression(spark, df(c)))
    val order = orderCols.map(c => Bridge.catalystExpression(spark, c) match {
      case so: SortOrder => so
      case e             => SortOrder(e, Ascending)
    })
    Bridge.ofRows(spark, TopKPerKeyPlan(k, keys, order, df.queryExecution.analyzed))
  }
}
