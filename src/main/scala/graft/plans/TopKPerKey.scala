package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension demo (builder preference order (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`): per-group top-k with
  * BOUNDED HEAPS.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY k ORDER BY
  * v) <= K` — fully SORTS every group (O(n log n) per group, sort buffers
  * sized by the group, spill under pressure) and only then discards all
  * but k rows. This operator keeps a k-bounded heap per group instead:
  * O(n log k) compares, memory O(groups × k) regardless of group size —
  * the difference between sorting 100 TB and scanning it, when k is 10.
  * The exchange is identical (cluster by group key, declared via
  * `requiredChildDistribution` so EnsureRequirements plans it); only the
  * post-shuffle operator changes.
  *
  * The ORDER MUST BE TOTAL (include a tiebreaker) for deterministic
  * ranks, same as the window idiom it replaces.
  */
final case class TopKPerKeyNode(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference, // constructor-held: exprId must survive copy()
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.partitionExprs, n.order, n.k, n.rankAttr,
        planLater(n.child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val orderLocal = order
    val partLocal = partitionExprs
    val outputLocal = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      // best = least under this ordering; heap head = worst kept (max-heap)
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(orderLocal, childOutput)
      val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      val groups = mutable.LinkedHashMap
        .empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      val toUnsafeIn = UnsafeProjection.create(childOutput, childOutput)
      it.foreach { row =>
        val u = row match {
          case ur: UnsafeRow => ur
          case r => toUnsafeIn(r) // e.g. a local relation child
        }
        val key = keyProj(u)
        val heap = groups.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            groups.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap += u.copy()
        else if (ord.compare(u, heap.head) < 0) { heap.dequeue(); heap += u.copy() }
      }
      val toUnsafe = UnsafeProjection.create(outputLocal, outputLocal)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      groups.iterator.flatMap { case (_, heap) =>
        val bestFirst: Array[UnsafeRow] = heap.toArray.sorted(heapOrd)
        bestFirst.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1)
          toUnsafe(joined(r, rankRow)).copy(): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** User-facing entry: per-group top-k through the custom operator. */
object TopK {
  import org.apache.spark.sql.graftaccess.Internals

  /** `orderBy` = (column, ascending); include a unique tiebreaker for
    * deterministic ranks. Appends `rankName` (1-based within group). */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
      k: Int, rankName: String = "rank"): DataFrame = {
    require(orderBy.nonEmpty && k > 0)
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = Internals.analyzedPlan(df)
    // resolve names with the session's resolver (case-insensitive under
    // the default spark.sql.caseSensitive=false), matching how the same
    // name resolves everywhere else in SQL/DataFrame code
    val resolver = Internals.resolver(spark)
    def attr(n: String): Attribute = child.output.find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${child.output.map(_.name)}"))
    val sortOrders = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    Internals.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrders, k,
        AttributeReference(rankName, IntegerType, nullable = false)(), child))
  }
}
