package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension: top-k rows per key — the full custom
  * LogicalPlan + SparkStrategy + SparkPlan ladder.
  *
  * The window formulation (`row_number over (partition by k order by o)
  * <= n`) shuffles EVERY row of every key before ranking; the typed
  * [[graft.functions.TopKAggregator]] bounds the shuffle but pays
  * aggregator serialization. This operator plans like an aggregate:
  * a PARTIAL exec keeps a bounded k-heap per key per input partition
  * (no distribution requirement — runs map-side), then a FINAL exec
  * (requiring clustering on the keys, so EnsureRequirements inserts
  * the one shuffle) merges the surviving ≤ k·partitions rows per key.
  * The shuffle carries at most k rows per (key, partition) — on a
  * 100 TB fact table with bounded k this is the difference between
  * shuffling the table and shuffling a bounded digest.
  *
  * Row order within a key is NOT defined on output (like any
  * aggregate); pair with a total `order` for deterministic CONTENT
  * and sort downstream for deterministic presentation.
  *
  * Memory envelope: the heaps live on-heap with NO spill path —
  * per-partition memory is O(distinct keys in the partition × k).
  * That is the right trade for the hot-key shape this operator
  * targets (rows-per-key >> k, bounded key count per partition); for
  * ultra-high key cardinality prefer the ranking window (external
  * sort) or [[graft.functions.TopKAggregator]] (spilling hash
  * aggregate), which degrade gracefully instead of OOMing.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical top-k-per-key: bounded heaps in a hash map per partition.
  * `partial = true` is the map-side pass (any distribution);
  * `partial = false` declares ClusteredDistribution(keys) so the
  * planner co-locates each key before the final merge. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(sortOrder, schema)
      // one bounded heap per key: java PQ ordered DESCENDING under
      // `ord`, so the head is the worst of the kept k and eviction is
      // O(log k)
      val heaps = mutable.LinkedHashMap.empty[InternalRow, java.util.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        // copy the (reused) projection output only on first sight of a
        // key — getOrElseUpdate's key argument is strict, so inlining
        // key.copy() there would allocate per ROW, not per key
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy()); ()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.asScala)
    }, preservesPartitioning = true)
  }
}

/** Plans [[TopKPerKey]] as partial-then-final [[TopKPerKeyExec]]s —
  * registered by [[GraftExtensions]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public entry: the top `k` rows of `df` per `keys` under `order`
    * (SortOrder columns, e.g. `df("price").desc`; bare columns sort
    * ascending). Use a TOTAL order for deterministic content. */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    // Self-registering: sessions built WITHOUT
    // `spark.sql.extensions=graft.plans.GraftExtensions` (embedding
    // users, notebooks, the adversarial sweep's own harness — which is
    // how this gap was found: "No plan for TopKPerKey" planner
    // assertion) get the strategy injected into
    // `experimental.extraStrategies` on first use. Idempotent, and
    // harmless beside the extension-installed copy (first match wins).
    // `extraStrategies` is plain mutable session state: an unguarded
    // check-and-append from two threads can lose an update and leave the
    // strategy unregistered, resurrecting the very planner crash this
    // registration prevents (ADVICE r7 #1) — lock the session's
    // experimental handle around the idempotence check.
    val exp = df.sparkSession.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(TopKStrategy))
        exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val keyExprs: Seq[Expression] = keys.map(n => GraftSqlShim.eagerExpression(df(n)))
    val sortOrders = order.map(c => GraftSqlShim.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortOrders, k, df.queryExecution.analyzed))
  }
}
