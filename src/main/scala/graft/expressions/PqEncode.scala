package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expression for the PQ ENCODE hot loop: for each of
  * the M sub-vector blocks, the strict-< argmin over that block's
  * K sub-centroids of the squared Euclidean distance — i.e. the M
  * 4-bit codes of one vector, as `array<int>`.
  *
  * Semantically identical to the declarative lowering
  * ([[graft.operators.Similarity.withBlockDists]] +
  * `array_position(ds_m, array_min(ds_m)) - 1` per block): same
  * left-to-right accumulation order inside each distance, same
  * first-index tie-break (PqEncodeSpec asserts code-for-code equality
  * over a real corpus). The declarative form pays M·K interpreted
  * higher-order evaluations per row (Spark HOFs are CodegenFallback);
  * this is three primitive loops over the row's ArrayData and a
  * `double[][][]` reference object — no per-row allocation beyond the
  * M-int result, no lambda dispatch. The codebook rides as a codegen
  * reference object, so generated source is byte-identical across
  * builds and the codegen cache hits.
  *
  * Used on the persisted-index build path ([[graft.operators.AnnIndex]]
  * `encode`) where the encode IS the corpus-sized job; the from-scratch
  * pedagogical queries keep the declarative form the optimizer rules
  * pattern-match (their oracles gate both shapes to the same values).
  *
  * Input contract: `child` is `array<double>` of length ≥ M·subDim
  * (shorter inputs read as zero-padded per block bounds — never past
  * the buffer); NaN-free by the embedding contract (NaN distances
  * never win the strict-< scan, so a NaN block yields code 0..). */
case class PqEncodeCodes(child: Expression,
                         codebook: Array[Array[Array[Double]]])
  extends UnaryExpression {

  private val m = codebook.length
  private val subDim = if (m > 0) codebook(0)(0).length else 0

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nElems = arr.numElements()
    // one bulk copy per row — the M·K·subDim inner loops then read a
    // local double[] instead of megamorphic ArrayData.getDouble calls
    // (see NearestCentroid.bulkCopy; M·K always amortizes the copy)
    val v = arr.toDoubleArray()
    val out = new Array[Int](m)
    var b = 0
    while (b < m) {
      val cents = codebook(b)
      val off = b * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        val lim = math.min(subDim, math.max(0, nElems - off))
        var d = 0.0
        var t = 0
        while (t < lim) {
          val diff = v(off + t) - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict <: first index wins
        j += 1
      }
      out(b) = best
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val lim = ctx.freshName("lim")
      val cents = ctx.freshName("cents")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val nElems = ctx.freshName("nElems")
      val v = ctx.freshName("v")
      s"""
         |int $nElems = $arr.numElements();
         |double[] $v = $arr.toDoubleArray();
         |int[] $out = new int[$m];
         |for (int $b = 0; $b < $m; $b++) {
         |  double[][] $cents = $cb[$b];
         |  int $off = $b * $subDim;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $cents.length; $j++) {
         |    double[] $c = $cents[$j];
         |    int $lim = java.lang.Math.min($subDim,
         |      java.lang.Math.max(0, $nElems - $off));
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $lim; $t++) {
         |      double $diff = $v[$off + $t] - $c[$t];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $out[$b] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  // VALUE equality over the codebook (see ProbeCells — Array fields
  // default to reference equality, which breaks plan-cache and
  // exchange-reuse matching on any subtree containing this node)
  // the matrix hash is cached per instance: Catalyst calls
  // hashCode/equals constantly during planning (rule memoization, set
  // dedup, canonicalized-plan compare), and an O(k·d) deepHashCode per
  // call turned AQE replanning into the measured bottleneck of the
  // x100 knn-graph build (executors idle, driver hashing)
  @transient private lazy val matrixHash: Int =
    java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case p: PqEncodeCodes =>
      child == p.child &&
        matrixHash == p.matrixHash &&
        java.util.Arrays.deepEquals(
          codebook.asInstanceOf[Array[AnyRef]],
          p.codebook.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    getClass, child,
    Integer.valueOf(matrixHash))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  /** Column-API entry point. */
  def apply(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      new PqEncodeCodes(GraftSqlBridge.expression(vec), codebook))
}
