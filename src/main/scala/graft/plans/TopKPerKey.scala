package graft.plans

import java.util.{HashMap => JHashMap, PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (tier (c) of the extension ladder: custom
  * LogicalPlan + SparkStrategy + SparkPlan): per-key top-k with
  * MAP-SIDE PARTIAL TOP-K.
  *
  * The declarative lowering — `row_number() OVER (PARTITION BY key
  * ORDER BY …) <= k` — gets Spark 4's WindowGroupLimit optimization:
  * a partial rank-limit before the exchange bounds shuffle volume to
  * k per key per task, like this operator. What it CANNOT skip is the
  * sorting: WindowGroupLimit sits above a full per-partition Sort on
  * both sides of the exchange (O(n log n) over every scanned row,
  * spillable buffers), plus the Window machinery to re-derive ranks.
  * This operator replaces all of that with bounded heaps — partial
  * then final, the reference's in-mapper-combiner shape
  * (`ref:KMeans.java:36-67`) applied to top-k instead of sums:
  * O(n log k) heap pushes map-side, no sort of the input on either
  * side of the exchange, same O(partitions · keys · k) exchange
  * volume. When a rank column is needed, a window over the ≤ keys·k
  * survivors is epsilon (see Similarity.rankTopK).
  *
  * Semantics contract: the caller's ordering must be a TOTAL order
  * (tie-break to uniqueness, e.g. append the row id) — with ties at
  * the k-boundary, "which tied row" is otherwise arbitrary on both
  * this path and the window path. Memory: each pass holds
  * (#distinct keys in the task) × k rows — the same working-set class
  * as a partial HashAggregate (no spill path; keys·k must fit, rows
  * need not).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    partialKeyCap: Int = TopKPerKeyExec.PartialKeyCap) extends UnaryNode {
  require(k > 0, s"topKPerKey: k must be positive, got $k")
  require(keys.nonEmpty, "topKPerKey: at least one key expression")
  require(partialKeyCap > 0, "topKPerKey: partialKeyCap must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Plans [[TopKPerKeyNode]] as partial → (Exchange inserted by
  * EnsureRequirements) → final. */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, cap) =>
      val partial =
        TopKPerKeyExec(keys, order, k, isFinal = false, planLater(child),
          partialKeyCap = cap)
      TopKPerKeyExec(keys, order, k, isFinal = true, partial,
        partialKeyCap = cap) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyExec {
  /** Distinct keys a PARTIAL task tracks before degrading: beyond the
    * cap, rows of unseen keys stream through uncut (the final pass
    * still cuts exactly, so results are unchanged) — the same graceful
    * degradation as Spark's partial HashAggregate fallback. Memory is
    * thereby bounded at cap·k rows per task even under key-per-row
    * cardinality; the operator just stops saving shuffle volume for
    * the overflow keys. */
  val PartialKeyCap = 1 << 16
}

/** One bounded-heap pass: keep the k first rows per key under `order`.
  * The partial instance accepts any input distribution; the final one
  * requires clustering on the keys, so EnsureRequirements inserts the
  * (already-reduced) hash exchange between the two. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    isFinal: Boolean,
    child: SparkPlan,
    partialKeyCap: Int = TopKPerKeyExec.PartialKeyCap)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (isFinal) "TopKPerKeyFinal" else "TopKPerKeyPartial"
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kCap = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val keyCap = if (isFinal) Int.MaxValue else partialKeyCap
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "less" = earlier in sort order = better rank; heap head = the
      // WORST retained row, so one peek decides admission.
      val rankOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(orderExprs, childOutput)
      val heaps = new JHashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
      // Lazy flatMap so overflow rows STREAM through (never buffered);
      // the heap survivors append after the input is drained. A
      // bypassed row is forwarded without copy — the exchange above
      // consumes each row before pulling the next. (The final pass
      // never bypasses: its input is already clustered and at most
      // survivors+overflow of the partials, and its output IS the
      // result set.)
      val passedThrough = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() < keyCap) {
          heap = new JPriorityQueue[InternalRow](kCap, rankOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap == null) Iterator.single(row)
        else {
          if (heap.size < kCap) heap.offer(row.copy())
          else if (rankOrd.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.offer(row.copy())
          }
          Iterator.empty
        }
      }
      passedThrough ++
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Public API + strategy registration. */
object TopKPerKey {

  /** Idempotently register the planner strategy on this session.
    * `experimental.extraStrategies` is the public additive registry for
    * exactly this (no sql-conf mutation, no effect on other plans);
    * sessions built with `GraftExtensions` get it at build time
    * instead. */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[TopKPerKeyStrategy]))
      spark.experimental.extraStrategies = cur :+ new TopKPerKeyStrategy
  }

  /** Top k rows per key group under `order` — (column, ascending?)
    * pairs over the input's columns; make it a total order (see the
    * node doc). Columns are resolved here against the analyzed child
    * plan (Column objects carry lazily-resolved wrapper nodes in 4.x
    * that never resolve inside a foreign logical node), so the node is
    * born fully resolved; derived sort expressions are one
    * `withColumn` away. Output columns = input columns; row set equals
    * the `row_number() <= k` window lowering. */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
                 k: Int,
                 partialKeyCap: Int = TopKPerKeyExec.PartialKeyCap): DataFrame = {
    register(df.sparkSession)
    val child = GraftSqlBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"topKPerKey: no column '$name' among ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (name, asc) =>
      val dir = if (asc) Ascending else Descending
      SortOrder(attr(name), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftSqlBridge.dataset(df.sparkSession,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, child, partialKeyCap))
  }
}
