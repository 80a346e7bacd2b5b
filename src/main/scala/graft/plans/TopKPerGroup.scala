package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class Catalyst operator — the custom
  * LogicalPlan → Strategy → SparkPlan tier of the extension ladder, used
  * where the built-in formulation (window `row_number() <= k`) carries the
  * wrong 100 TB shape: a window sorts EVERY row of every group behind one
  * exchange of the full input, while top-k per group only ever needs k
  * rows per group in memory and `groups × k` rows on the wire.
  *
  * Physical shape (mirrors partial aggregation):
  *   partial TopKPerGroupExec   — per-partition bounded heaps, no
  *                                distribution requirement;
  *   exchange (groups × k rows) — inserted by EnsureRequirements, and
  *                                ELIDED when the child already clusters
  *                                by the group key (bucketed layout);
  *   final TopKPerGroupExec     — same heaps over the shuffled survivors.
  *
  * The ordering must be TOTAL (callers tie-break with a unique column):
  * heap eviction on equal rows is arrival-order-dependent otherwise.
  */
case class TopKPerGroupPlan(
    grouping: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Bounded-heap exec node; `partial` toggles the distribution requirement
  * exactly like partial/final hash aggregation.
  */
case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(grouping))

  protected override def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val canon = UnsafeProjection.create(childOutput, childOutput)
      val ord: BaseOrdering = RowOrdering.create(sortOrder, childOutput)
      // Max-heap under the sort order: head = current worst of the kept k.
      val heapOrd: Ordering[UnsafeRow] = ord.on((r: UnsafeRow) => r: InternalRow)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        if (heap.size < limit) heap.enqueue(canon(row).copy())
        else if (ord.lt(row, heap.head)) {
          heap.dequeue()
          heap.enqueue(canon(row).copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupPlan]] as final-over-partial, leaving the exchange
  * decision to EnsureRequirements. Registered by `GraftExtensions`
  * (injectPlannerStrategy) or lazily via `experimental.extraStrategies`.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(grouping, order, k, child) =>
      TopKPerGroupExec(grouping, order, k, partial = false,
        TopKPerGroupExec(grouping, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
