package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension surface: per-group top-k as a first-class
  * physical operator — logical node ([[TopKPerGroup]]), planner strategy
  * ([[TopKStrategy]]), and physical operator ([[TopKPerGroupExec]]) wired
  * through `spark.experimental.extraStrategies`.
  *
  * Why a custom operator when a window (`row_number <= k`) expresses the
  * same result: the window plan SORTS every partition's full group contents
  * (shuffle all rows, sort, rank, then discard all but k), so at 100 TB the
  * shuffle carries the whole fact table. This operator keeps a bounded
  * k-element heap per group on BOTH sides of the exchange — the map side
  * emits at most k rows per (partition, group), the shuffle moves only
  * those, and no sort of the full data ever happens. Same partial/final
  * shape as Spark's own hash aggregate; state is bounded by
  * groups-per-partition × k rows.
  *
  * The same result is available as a UDAF ([[graft.functions.TopKAggregator]])
  * where injecting a strategy isn't an option; this operator additionally
  * returns rows in their original width (no struct packing) with a rank
  * column, and pins the plan shape (one exchange, no SortExec) in
  * `TopKPlanSpec`.
  */
case class TopKPerGroup(groupCols: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partial = TopKPerGroupExec(g, o, k, rank, partial = true,
        planLater(child))
      TopKPerGroupExec(g, o, k, rank, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group top-k. `partial = true` runs before the exchange with
  * no distribution requirement (per-partition heaps, emits ≤ k rows per
  * group per partition, no rank). `partial = false` declares
  * `ClusteredDistribution(groupCols)` — EnsureRequirements inserts the one
  * hash exchange — and emits each group's final top k with `rank` 1..k.
  */
case class TopKPerGroupExec(groupCols: Seq[Expression], order: Seq[SortOrder],
                            k: Int, rankAttr: Attribute, partial: Boolean,
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr :: Nil)

  // rankAttr is an output-only field; without this override the partial
  // node would "reference" an attribute its child never produces and print
  // as invalid (!TopKPerGroup) in explain output
  override def references: AttributeSet =
    AttributeSet((groupCols ++ order).flatMap(_.references))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupCols
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // generated comparator over the child row — evaluates the SortOrder
      // keys directly, so heap entries are plain row copies, no key tuple
      val cmp = GenerateOrdering.generate(sortOrder, childOutput)
      // reverse: head of the heap = WORST retained row (classic top-k)
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = groups.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, heapCmp)
          groups.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) { // row ranks before worst
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      if (isPartial) {
        groups.forEach((_, heap) => { heap.forEach(r => out += r) })
        out.iterator
      } else {
        val withRank = UnsafeProjection.create(
          childOutput.zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable)
          } :+ BoundReference(childOutput.size, IntegerType, false),
          childOutput :+ rankAttr)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        groups.forEach { (_, heap) =>
          val rows = new Array[InternalRow](heap.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // poll worst-first
          var r = 0
          while (r < rows.length) {
            rankRow.update(0, r + 1)
            out += withRank(joined(rows(r), rankRow)).copy()
            r += 1
          }
        }
        out.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** DataFrame-level entry: installs [[TopKStrategy]] into the session (an
  * idempotent `extraStrategies` append) and plans `df` through the custom
  * operator. `orderCols` must induce a TOTAL order within each group for a
  * deterministic result (add a key tiebreak, same rule as any ranking).
  */
object TopKPlans {
  def ensureInstalled(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }

  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[(String, Boolean)], k: Int,
                   rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    ensureInstalled(spark)
    val analyzed = df.queryExecution.analyzed
    def attrOf(name: String): Attribute = analyzed.output.filter(_.name == name) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column $name is ambiguous (${many.size} matches) — alias before topKPerGroup")
    }
    val g = groupCols.map(attrOf)
    val so = orderCols.map { case (c, asc) =>
      SortOrder(attrOf(c), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    org.apache.spark.sql.GraftShim.dataFrame(spark,
      TopKPerGroup(g, so, k, rank, analyzed))
  }
}
