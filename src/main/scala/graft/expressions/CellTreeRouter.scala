package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Beam-search routing tree over an n-scaled coarse-cell centroid set.
  *
  * The IVF cell count scales with the corpus
  * ([[graft.operators.KMeansQueries.coarseK]] = ⌈n/256⌉ — that is what
  * keeps CANDIDATE volume linear), which turns the flat per-row
  * routing scan ([[ProbeCells]] / [[NearestCentroid]]) into the
  * board's one super-linear term: O(k·d) per row = Θ(n²·d/256) per
  * corpus pass (BENCH_LADDER r15: ann_knn_graph 1.59 growth/decade,
  * dedup_embed_cluster 1.20 — both are this routing, run corpus-side
  * twice per build). This tree makes routing LOGARITHMIC in the cell
  * count: the k leaf centroids are grouped into contiguous blocks of
  * [[CellTree.Branch]], each parent is the mean of its block, levels
  * stack until the root level fits one block, and a row routes by
  * scoring the root block then beam-descending — per row
  * O(Branch·Beam·log_Branch(k)·d), so a corpus pass is
  * O(n·d·log n): ~150·d at k=782 vs 782·d flat, ~550·d at the
  * 100 TB-scale k ≈ 4·10⁷ where the flat scan is 4·10⁷·d and simply
  * does not run.
  *
  * Approximation contract: with ≤ [[CellTree.Branch]] cells the tree
  * is a single level and routing IS the flat scan — bitwise identical
  * to [[ProbeCells]] (same (distance, id) lexicographic select, same
  * strict-< tie-break; spec-pinned). Above Branch the beam may return
  * a near- instead of true-nearest cell — acceptable by construction
  * for an IVF BLOCKING structure (the cells are themselves an
  * untrained first-k approximation; what matters is that a vector and
  * its near-duplicates route CONSISTENTLY, which they do: routing is
  * a deterministic pure function of the vector, and nearby vectors
  * descend the same branches). Every correctness SF has k = 8 ≤
  * Branch, so the DuckDB oracles replay the exact flat scan
  * unchanged; only the bench ladder's x10/x100 rungs (k = 79 / 782)
  * and real large corpora take the tree path.
  *
  * Tree layout: `levels(0)` is the root block (≤ Branch nodes),
  * `levels(last)` is the original centroid matrix; children of node
  * `p` at level `l` are the contiguous indices
  * [p·Branch, min((p+1)·Branch, |level l+1|)) — no child-index
  * arrays, the block structure is implicit. Build cost is one O(k·d)
  * mean cascade on the driver (the centroids are already driver-side
  * k·d doubles at every call site).
  */
final class CellTree(val levels: Array[Array[Array[Double]]])
    extends Serializable {

  /** Leaf count — the original cell count. */
  def k: Int = levels(levels.length - 1).length

  /** Top-`topN` leaf cell ids for `vec`, ordered by (squared
    * distance, id) ascending — the [[ProbeCells]] output contract.
    * Returns min(topN, k) ids. Called per row from both eval and the
    * generated code (one virtual dispatch per row; the O(d·Branch·
    * Beam·levels) loop body dwarfs it). */
  def route(vec: ArrayData, topN: Int): ArrayData =
    new GenericArrayData(
      routeArray(vec.toDoubleArray(), topN).map(Int.box)
        .asInstanceOf[Array[Any]])

  /** Driver-side twin of [[route]] (the [[AnnIndex]] cell-pruning
    * path): same descent, same tie-break, primitive arrays in/out.
    *
    * Above one level the leaf candidate pool is bounded by the last
    * beam expansion — at most [[CellTree.Beam]]·[[CellTree.Branch]]
    * leaves ever get scored — so `topN` beyond that bound cannot be
    * honored; the require makes the truncation loud instead of a
    * silent short array (ADVICE r16). Current callers (NProbe,
    * SeedProbe, single-cell assignment) sit far below it. */
  def routeArray(v: Array[Double], topN: Int): Array[Int] = {
    require(levels.length == 1 || topN <= CellTree.Beam * CellTree.Branch,
      s"topN=$topN exceeds the beam leaf-candidate pool " +
        s"Beam*Branch=${CellTree.Beam * CellTree.Branch}; widen " +
        "CellTree.Beam or route flat")
    val nv = v.length
    var frontier: Array[Int] = null // null = "all nodes" (root level)
    var frontierN = 0
    var l = 0
    var out: Array[Int] = null
    while (l < levels.length) {
      val cents = levels(l)
      val isLeaf = l == levels.length - 1
      val keep =
        if (isLeaf) math.min(topN, cents.length)
        else math.min(CellTree.Beam, cents.length)
      val selD = new Array[Double](keep)
      val selI = new Array[Int](keep)
      var filled = 0
      // candidate enumeration: root level scans all nodes; below, the
      // contiguous child blocks of the kept frontier nodes
      val nGroups = if (frontier == null) 1 else frontierN
      var g = 0
      while (g < nGroups) {
        val start =
          if (frontier == null) 0 else frontier(g) * CellTree.Branch
        val end =
          if (frontier == null) cents.length
          else math.min(start + CellTree.Branch, cents.length)
        var i = start
        while (i < end) {
          val c = cents(i)
          val m = math.min(nv, c.length)
          var d = 0.0
          var j = 0
          while (j < m) {
            val diff = v(j) - c(j)
            d += diff * diff
            j += 1
          }
          // lexicographic (d, id) insertion-select: unlike ProbeCells
          // the candidate ids do NOT arrive in ascending order (beam
          // groups interleave), so ties compare ids explicitly
          if (filled < keep || d < selD(keep - 1) ||
              (d == selD(keep - 1) && i < selI(keep - 1))) {
            var p = if (filled < keep) filled else keep - 1
            while (p > 0 && (d < selD(p - 1) ||
                (d == selD(p - 1) && i < selI(p - 1)))) {
              selD(p) = selD(p - 1); selI(p) = selI(p - 1); p -= 1
            }
            selD(p) = d; selI(p) = i
            if (filled < keep) filled += 1
          }
          i += 1
        }
        g += 1
      }
      frontier = selI
      frontierN = filled
      if (isLeaf) out = if (filled == keep) selI else selI.take(filled)
      l += 1
    }
    out
  }

  // value equality + cached hash: same contract (and same reason) as
  // ProbeCells — canonicalized-plan compare and exchange reuse use ==,
  // and every call site builds a fresh tree from a fresh collect
  @transient private lazy val treeHash: Int = {
    var h = 17
    var l = 0
    while (l < levels.length) {
      h = h * 31 + java.util.Arrays.deepHashCode(
        levels(l).asInstanceOf[Array[AnyRef]])
      l += 1
    }
    h
  }

  override def equals(other: Any): Boolean = other match {
    case t: CellTree =>
      treeHash == t.treeHash && levels.length == t.levels.length &&
        levels.indices.forall(l => java.util.Arrays.deepEquals(
          levels(l).asInstanceOf[Array[AnyRef]],
          t.levels(l).asInstanceOf[Array[AnyRef]]))
    case _ => false
  }
  override def hashCode(): Int = treeHash
}

object CellTree {
  /** Block size: nodes per parent, and the flat-scan threshold below
    * which the tree degenerates to one exact level. 32 keeps the root
    * scan and each beam expansion one cache-friendly primitive loop. */
  val Branch = 32

  /** Beam width for internal levels. Routing misses need the true
    * cell's ancestor to fall outside the top-4 blocks at some level —
    * rare even on untrained block means, and a miss in a BLOCKING
    * structure costs recall epsilon, never correctness. */
  val Beam = 4

  /** Mean-cascade build: leaves = `cents`, each level groups the one
    * below into contiguous blocks of [[Branch]] with the block mean as
    * parent, until a level fits a single block. O(k·d) total. */
  def build(cents: Array[Array[Double]]): CellTree = {
    var levels = List(cents)
    while (levels.head.length > Branch) {
      val cur = levels.head
      val d = cur(0).length
      val nPar = (cur.length + Branch - 1) / Branch
      val par = Array.tabulate(nPar) { p =>
        val s = p * Branch
        val e = math.min(s + Branch, cur.length)
        val m = new Array[Double](d)
        var i = s
        while (i < e) {
          var j = 0
          while (j < d) { m(j) += cur(i)(j); j += 1 }
          i += 1
        }
        val cnt = (e - s).toDouble
        var j = 0
        while (j < d) { m(j) /= cnt; j += 1 }
        m
      }
      levels = par :: levels
    }
    new CellTree(levels.toArray)
  }
}

/** [[ProbeCells]]' tree-routed sibling: top-`topN` leaf cell ids by
  * beam descent of a [[CellTree]], ordered by (squared distance, id)
  * ascending. Chosen over the flat scan by
  * [[graft.operators.CellRouting]] when the cell count exceeds
  * [[CellTree.Branch]]. Null vector ⇒ null (null-intolerant), same as
  * [[ProbeCells]]. The tree rides as a codegen reference object — the
  * generated source is byte-identical across centroid sets, so the
  * codegen cache hits; per-row work happens in [[CellTree.route]]
  * (one virtual call from the generated code, amortized by the
  * routing loop body). */
case class ProbeCellsTree(child: Expression, tree: CellTree, topN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "probe_cells_tree"

  override def nullSafeEval(input: Any): Any =
    tree.route(input.asInstanceOf[ArrayData], topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val t = ctx.addReferenceObj("tree", tree,
        classOf[CellTree].getName)
      s"${ev.value} = $t.route($arr, $topN);"
    })

  override def equals(other: Any): Boolean = other match {
    case p: ProbeCellsTree =>
      topN == p.topN && child == p.child && tree == p.tree
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(topN),
      Integer.valueOf(tree.hashCode()))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProbeCellsTree {
  /** Column-API entry point. */
  def apply(vec: Column, tree: CellTree, topN: Int): Column =
    GraftSqlBridge.column(
      new ProbeCellsTree(GraftSqlBridge.expression(vec), tree, topN))
}
