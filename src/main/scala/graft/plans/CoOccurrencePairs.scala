package graft.plans

import java.util.{HashMap => JHashMap}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension (tier (c): custom LogicalPlan +
  * SparkStrategy + SparkPlan): CO-OCCURRENCE PAIR COUNTING — for
  * (group, item) input rows, the count per unordered item pair of how
  * many groups contain both items. The market-basket / co-purchase /
  * co-citation primitive: [[graft.operators.RelationalQueries
  * .qTriangles]] uses it for shared-customer supplier affinity, and
  * the same shape serves term co-occurrence or any "projected
  * bipartite weight" workload.
  *
  * Why not the declarative lowering (self-join on the group key +
  * `groupBy(a, b).count`)? Its cost is one generic HashAggregate
  * probe per WEDGE — Σ_g d_g(d_g−1)/2 rows, each paying UnsafeRow
  * hashing/equality through the aggregate iterator (measured at the
  * x100 ladder rung: 1.25e9 wedges, ~1.9 µs each, ≈2.3k CPU-s — the
  * rung's dominant stage). This operator generates and counts wedges
  * in one fused pass over primitive long arrays (open-addressing map,
  * no per-wedge row materialization), then ships only the per-task
  * distinct-pair partials to a final merge: identical output, the
  * same two-exchange shape, ~an order less CPU per wedge.
  *
  * Plan shape (mirrors [[TopKPerKeyNode]]'s partial→final):
  *   partial (clustered on group) → Exchange(s1,s2) → final.
  * The partial task needs every row of a group (the group's item set
  * builds the pairs), so EnsureRequirements clusters on the group
  * key; a caller-supplied `repartition(n, group)` satisfies it and
  * fixes the width. The final merge is exact integer addition keyed
  * on the pair.
  *
  * Memory contract (the [[TopKPerKeyExec]] class of bound, no spill
  * path): a partial task holds its group item-lists (≤ its input
  * rows) plus a pair map CAPPED at [[CoOccurrencePairsExec
  * .PartialPairCap]] entries — beyond the cap, NEW pairs stream
  * through as single-count rows (the TopKPerKey bypass idea: the
  * final merge re-sums them, results unchanged, the task just stops
  * combining the overflow). A final task holds its shard of the
  * distinct pairs; `finalPartitions` lets the caller size that shard
  * data-proportionally (qTriangles passes its wedge-derived width)
  * instead of inheriting the session shuffle width.
  *
  * Semantics notes: items are SET-valued per group (duplicate
  * (group, item) rows count once — the item list is sorted and
  * de-duplicated before pairing; callers feeding pre-distinct rows
  * pay nothing for this), pairs are canonical (s1 < s2), groups of
  * one item emit nothing, and group/item must be non-null longs. */
case class CoOccurrencePairsNode(
    group: Expression,
    item: Expression,
    finalPartitions: Option[Int],
    // output attrs ride as a constructor arg so copy()/transform keep
    // their exprIds stable — a regenerated-per-instance output would
    // orphan downstream references on every plan rewrite
    output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(group.dataType == LongType && item.dataType == LongType,
    "coOccurrencePairs: group and item must be LongType")
  // the pair attrs are GENERATED here, not forwarded from the child —
  // without this CheckAnalysis reports them "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(c: LogicalPlan): CoOccurrencePairsNode =
    copy(child = c)
}

class CoOccurrencePairsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CoOccurrencePairsNode(group, item, finalParts, out, child) =>
      val partial = CoOccurrencePairsExec(group, item, out,
        isFinal = false, finalParts, planLater(child))
      CoOccurrencePairsExec(group, item, out, isFinal = true,
        finalParts, partial) :: Nil
    case _ => Nil
  }
}

object CoOccurrencePairsExec {
  /** Pair-map SLOT cap for a PARTIAL task (load factor 0.5 → half
    * this many combined pairs, ≈ 96 MB of parallel long arrays at the
    * ceiling) before degrading to pass-through for unseen pairs
    * (existing pairs still increment). The cap bounds memory under
    * any skew; it only costs shuffle volume for the overflow. */
  val PartialPairCap = 1 << 22
}

/** Open-addressing (s1, s2) → count map over ONE interleaved long
  * array (slot = 3 consecutive longs: k1, k2, count) so a probe costs
  * one cache line, not three — the map is bigger than L2 at real
  * sizes and per-probe misses dominate. Count 0 marks an empty slot
  * (live counts are ≥ 1). */
private final class PairCountMap(initialCapacity: Int, maxCapacity: Int) {
  private var slots = Integer.highestOneBit(
    math.max(64, initialCapacity * 2 - 1)) * 2 // pow2 ≥ 2×initial
  private var t = new Array[Long](slots * 3)
  private var used = 0

  def size: Int = used

  private def mix(a: Long, b: Long): Int = {
    // 64-bit avalanche over the packed pair (splitmix64 finalizer)
    var h = a * 0x9e3779b97f4a7c15L + b
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt
  }

  /** Add `w` to the pair's count; false iff the map is saturated and
    * the pair is new (caller streams the row through instead). */
  def add(a: Long, b: Long, w: Long): Boolean = {
    var i = (mix(a, b) & (slots - 1)) * 3
    while (t(i + 2) != 0L) {
      if (t(i) == a && t(i + 1) == b) { t(i + 2) += w; return true }
      i += 3
      if (i == slots * 3) i = 0
    }
    if (used * 2 >= slots) { // load 0.5
      if (slots >= maxCapacity) return false
      grow()
      return add(a, b, w)
    }
    t(i) = a; t(i + 1) = b; t(i + 2) = w; used += 1
    true
  }

  private def grow(): Unit = {
    val (ot, oslots) = (t, slots)
    slots = slots * 2
    t = new Array[Long](slots * 3)
    used = 0
    var i = 0
    while (i < oslots * 3) {
      if (ot(i + 2) != 0L) { add(ot(i), ot(i + 1), ot(i + 2)); () }
      i += 3
    }
  }

  /** Drain live entries as (s1, s2, count) triples. */
  def iterator: Iterator[(Long, Long, Long)] = new Iterator[(Long, Long, Long)] {
    private var i = 0
    private def advance(): Unit = while (i < slots * 3 && t(i + 2) == 0L) i += 3
    advance()
    override def hasNext: Boolean = i < slots * 3
    override def next(): (Long, Long, Long) = {
      val r = (t(i), t(i + 1), t(i + 2)); i += 3; advance(); r
    }
  }
}

/** Growable primitive long buffer (the per-group item list). */
private final class LongBuf {
  private var a = new Array[Long](8)
  var n = 0
  def add(v: Long): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
    a(n) = v; n += 1
  }
  /** Sorted, de-duplicated view (sorts in place). */
  def sortedDistinct(): (Array[Long], Int) = {
    java.util.Arrays.sort(a, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    (a, w)
  }
}

case class CoOccurrencePairsExec(
    group: Expression,
    item: Expression,
    output: Seq[Attribute],
    isFinal: Boolean,
    finalPartitions: Option[Int],
    child: SparkPlan,
    partialPairCap: Int = CoOccurrencePairsExec.PartialPairCap)
  extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the FINAL's child exchange hashes on (s1, s2) — output attrs, so
  // the partitioning is reportable; the PARTIAL's input partitioning
  // is over the group key, which does not survive into (s1, s2, w) —
  // report unknown rather than a partitioning over absent attrs
  override def outputPartitioning: Partitioning =
    if (isFinal) child.outputPartitioning
    else org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
      child.outputPartitioning.numPartitions)
  override def nodeName: String =
    if (isFinal) "CoOccurrencePairsFinal" else "CoOccurrencePairsPartial"
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal)
      ClusteredDistribution(output.take(2),
        requiredNumPartitions = finalPartitions) :: Nil
    else ClusteredDistribution(group :: Nil) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    if (isFinal) executeFinal() else executePartial()

  private def executePartial(): RDD[InternalRow] = {
    val groupExpr = group
    val itemExpr = item
    val childOutput = child.output
    val cap = partialPairCap
    child.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(Seq(groupExpr, itemExpr), childOutput)
      val groups = new JHashMap[java.lang.Long, LongBuf]()
      var itemLo = Long.MaxValue
      var itemHi = Long.MinValue
      while (iter.hasNext) {
        val r = proj(iter.next())
        val g = java.lang.Long.valueOf(r.getLong(0))
        var buf = groups.get(g)
        if (buf == null) { buf = new LongBuf; groups.put(g, buf) }
        val v = r.getLong(1)
        if (v < itemLo) itemLo = v
        if (v > itemHi) itemHi = v
        buf.add(v)
      }
      // direct UnsafeRow writer (no boxing, no projection): 3-long
      // fixed layout, buffer reused — the exchange serializes each row
      // before pulling the next
      val writer = new org.apache.spark.sql.catalyst.expressions.codegen
        .UnsafeRowWriter(3)
      def emit(a: Long, b: Long, w: Long): InternalRow = {
        writer.reset()
        writer.write(0, a); writer.write(1, b); writer.write(2, w)
        writer.getRow
      }
      val it = groups.values().iterator()
      if (itemLo >= 0L && itemHi < (1L << 32)) {
        // FAST PATH — chunked SORT-based counting: wedges pack into one
        // long (s1<<32 | s2, injective for uint32 items), fill a fixed
        // chunk buffer with sequential writes, sort it, and run-length
        // emit equal keys. No hash probes at all: a hash map of
        // real-task size (tens of MB) costs a cache+TLB miss per wedge
        // — measured 157 CPU-s for 125M wedges at the x10 rung, no
        // better than the generic HashAggregate it replaced — while
        // fill+sort+scan is sequential-bandwidth work. Chunks bound
        // memory exactly like the map cap (a chunk boundary only splits
        // counts; the final merge re-sums), and a group larger than one
        // chunk pauses mid-group and resumes in the next chunk.
        val chunk = new Array[Long](math.max(64, cap / 2))
        new Iterator[InternalRow] {
          private var n = 0
          private var items: Array[Long] = null
          private var m = 0
          private var i = 0
          private var j = 1
          private var inputDone = false
          private var draining = false
          private var pos = 0
          private def fill(): Unit = {
            while (n < chunk.length) {
              if (items == null || i >= m - 1) {
                if (!it.hasNext) { inputDone = true; return }
                val (arr, mm) = it.next().sortedDistinct()
                items = arr; m = mm; i = 0; j = 1
              } else if (j >= m) {
                i += 1; j = i + 1
              } else {
                chunk(n) = (items(i) << 32) | items(j)
                n += 1; j += 1
              }
            }
          }
          override def hasNext: Boolean = {
            while (!draining || pos >= n) {
              if (draining) { draining = false; n = 0 }
              if (inputDone) return false
              fill()
              if (n > 0) {
                java.util.Arrays.sort(chunk, 0, n)
                draining = true; pos = 0
              } else if (inputDone) return false
            }
            true
          }
          override def next(): InternalRow = {
            val key = chunk(pos)
            var c = 1L
            pos += 1
            while (pos < n && chunk(pos) == key) { c += 1; pos += 1 }
            emit(key >>> 32, key & 0xffffffffL, c)
          }
        }
      } else {
        // FALLBACK for items outside [0, 2^32) — the capped map with
        // pass-through overflow (the TopKPerKey bypass shape): overflow
        // pairs stream through as singles; combined pairs follow after
        // all groups are drained
        val pairs = new PairCountMap(1 << 16, cap)
        val streamed: Iterator[InternalRow] = new Iterator[InternalRow] {
          private var items: Array[Long] = null
          private var m = 0
          private var i = 0
          private var j = 0
          private var pending: InternalRow = null
          private def step(): Unit = {
            while (pending == null) {
              if (items == null || i >= m - 1) {
                if (!it.hasNext) return
                val (arr, mm) = it.next().sortedDistinct()
                items = arr; m = mm; i = 0; j = 1
              } else if (j >= m) {
                i += 1; j = i + 1
              } else {
                if (!pairs.add(items(i), items(j), 1L))
                  pending = emit(items(i), items(j), 1L)
                j += 1
              }
            }
          }
          override def hasNext: Boolean = { step(); pending != null }
          override def next(): InternalRow = {
            step(); val r = pending; pending = null; r
          }
        }
        streamed ++ pairs.iterator.map { case (a, b, w) => emit(a, b, w) }
      }
    }
  }

  private def executeFinal(): RDD[InternalRow] = {
    child.execute().mapPartitions { iter =>
      // exact merge: every partial of a pair lands in this task, so
      // the map must hold the task's full pair shard — size the final
      // exchange (finalPartitions) to the pair cardinality
      val pairs = new PairCountMap(1 << 16, Int.MaxValue)
      while (iter.hasNext) {
        val r = iter.next()
        if (!pairs.add(r.getLong(0), r.getLong(1), r.getLong(2)))
          throw new IllegalStateException("coOccurrencePairs: final merge map saturated")
      }
      val writer = new org.apache.spark.sql.catalyst.expressions.codegen
        .UnsafeRowWriter(3)
      pairs.iterator.map { case (a, b, w) =>
        writer.reset()
        writer.write(0, a); writer.write(1, b); writer.write(2, w)
        writer.getRow
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): CoOccurrencePairsExec =
    copy(child = c)
}

/** Public API + strategy registration (the [[TopKPerKey]] pattern). */
object CoOccurrencePairs {

  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[CoOccurrencePairsStrategy]))
      spark.experimental.extraStrategies = cur :+ new CoOccurrencePairsStrategy
  }

  /** Per-unordered-pair co-occurrence counts over (group, item) rows:
    * output (s1, s2, w) with s1 < s2, w = #groups containing both.
    * `finalPartitions` sizes the pair-merge exchange (pass a
    * data-proportional width when the pair cardinality is known). */
  def pairCounts(df: DataFrame, groupCol: String, itemCol: String,
                 finalPartitions: Option[Int] = None): DataFrame = {
    register(df.sparkSession)
    val child = GraftSqlBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"pairCounts: no column '$name' among " +
            child.output.map(_.name).mkString(", ")))
    val out = Seq(
      AttributeReference("s1", LongType, nullable = false)(),
      AttributeReference("s2", LongType, nullable = false)(),
      AttributeReference("w", LongType, nullable = false)())
    GraftSqlBridge.dataset(df.sparkSession,
      CoOccurrencePairsNode(attr(groupCol), attr(itemCol),
        finalPartitions, out, child))
  }
}
