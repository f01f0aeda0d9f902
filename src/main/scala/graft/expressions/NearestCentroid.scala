package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression for the k-means assignment hot loop:
  * argmin over k centroids of the squared Euclidean distance, ties to
  * the lowest index (the reference's strict-< scan, Point.java:57-71).
  *
  * Semantically identical to the built-in composition in
  * [[graft.kmeans.KMeansOps.assignDyn]] (same left-to-right accumulation
  * order, same tie-break — asserted by KMeansSpec), but the generated
  * code is two primitive loops over the row's ArrayData and a
  * `double[][]` reference object: no per-row array allocation, no
  * per-element lambda dispatch. At 100 TB the assignment is O(n·k·d)
  * flops on every row of the corpus — this is the one expression worth
  * hand-lowering (SURVEY.md §7.3 preference order (b)).
  *
  * The centroid matrix rides as a codegen reference object, so the
  * generated source is byte-identical across Lloyd iterations and the
  * codegen cache hits (same property as the typedLit path).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  // input contract: child is array<double> (enforced by the call sites,
  // which cast the vector column; ExpectsInputTypes is private[sql]).
  // Contract vs the declarative form (KMeansOps.assignDyn): identical on
  // non-empty centroid sets and NaN-free inputs. Divergences, by
  // contract: empty centroids ⇒ -1 here vs NULL declaratively (the
  // optimizer rewrite refuses empty literals, so it never changes a
  // result); NaN coordinates ⇒ -1 here (NaN distances never win the
  // strict-< scan) vs 0 declaratively (array_min/array_position use
  // NaN-normalizing equality). K-means inputs are NaN-free by contract.
  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  // Above this many centroids, the k·d inner loop reads the vector
  // from a LOCAL double[] (one bulk toDoubleArray copy per row)
  // instead of k·d ArrayData.getDouble calls — the call site is
  // megamorphic in real plans (Unsafe, Generic and Columnar arrays all
  // flow through), so the JIT neither inlines nor vectorizes it; the
  // copy amortizes once the matrix is reread k times. Small-k callers
  // (the k-means kernel, k=4..16) keep the direct reads: there the
  // per-row allocation costs more than the dispatch. Results are
  // bitwise identical either way (same operations, same order).
  private def bulkCopy: Boolean = centroids.length >= 16

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nElems = arr.numElements()
    var best = -1
    var bestD = Double.MaxValue
    val local: Array[Double] = if (bulkCopy) arr.toDoubleArray() else null
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      // bound by BOTH lengths: a shorter input vector must not read
      // past the ArrayData buffer (UnsafeArrayData does no bounds
      // checks with assertions off)
      val m = math.min(nElems, c.length)
      var d = 0.0
      var j = 0
      if (local != null) {
        while (j < m) {
          val diff = local(j) - c(j)
          d += diff * diff
          j += 1
        }
      } else {
        while (j < m) {
          val diff = arr.getDouble(j) - c(j)
          d += diff * diff
          j += 1
        }
      }
      if (d < bestD) { bestD = d; best = i } // strict <: first index wins
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val nElems = ctx.freshName("nElems")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val v = ctx.freshName("v")
      val read = if (bulkCopy) s"$v[$j]" else s"$arr.getDouble($j)"
      val copy = if (bulkCopy) s"double[] $v = $arr.toDoubleArray();" else ""
      s"""
         |int $best = -1;
         |double $bestD = Double.MAX_VALUE;
         |int $nElems = $arr.numElements();
         |$copy
         |for (int $i = 0; $i < $cents.length; $i++) {
         |  double[] $c = $cents[$i];
         |  int $m = java.lang.Math.min($nElems, $c.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $diff = $read - $c[$j];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $i; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  // VALUE equality over the centroid matrix (see ProbeCells — Array
  // fields default to reference equality, which breaks plan-cache and
  // exchange-reuse matching on any subtree containing this node)
  // the matrix hash is cached per instance: Catalyst calls
  // hashCode/equals constantly during planning (rule memoization, set
  // dedup, canonicalized-plan compare), and an O(k·d) deepHashCode per
  // call turned AQE replanning into the measured bottleneck of the
  // x100 knn-graph build (executors idle, driver hashing)
  @transient private lazy val matrixHash: Int =
    java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case p: NearestCentroid =>
      child == p.child &&
        matrixHash == p.matrixHash &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]],
          p.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child,
    Integer.valueOf(matrixHash))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-API entry point. */
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      new NearestCentroid(GraftSqlBridge.expression(vec), centroids))
}
