package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the k-means‖ min-distance carry:
  * the MINIMUM Euclidean (L2, sqrt) distance from the row's vector to
  * a small literal candidate set — the hot inner loop of
  * [[graft.operators.KMeansQueries.kmeansParInit]]'s per-round
  * `dmin ← min(dmin, min_c ‖v − c‖)` fold and of its final ownership
  * pass's distance basis.
  *
  * Bitwise identical to the declarative
  * `array_min(transform(candsLit, c => l2Dist(v, c)))` it replaces:
  * each per-candidate distance accumulates the squared diffs in the
  * same left-to-right element order (`zip_with` + `aggregate`'s fold
  * order) before one `sqrt`, and min over NaN-free doubles is exact
  * whatever the order, so `sqrt(min d²) ≡ min(sqrt d²)` value-for-
  * value (sqrt is monotone; equal-after-rounding square roots yield
  * the same double either way). The declarative form evaluates an
  * interpreted lambda per (row × candidate × dimension) —
  * [[PqEncodeCodes]]' measured bottleneck shape — while this is two
  * primitive loops and a reference-object `double[][]`, whole-stage
  * codegen friendly ([[NearestCentroid]]'s design; its Scaladoc
  * carries the shared rationale). Parity is spec-pinned
  * (MinL2DistSpec: bitwise equality against the declarative lowering
  * on random data).
  *
  * Empty candidate sets are refused at construction — a min over
  * nothing has no value and no call site wants one. NaN inputs are
  * out of contract (k-means inputs are NaN-free; NaN distances never
  * win the strict-< scan, mirroring [[NearestCentroid]]).
  */
case class MinL2Dist(child: Expression, cands: Array[Array[Double]])
    extends UnaryExpression {

  require(cands.nonEmpty, "MinL2Dist needs at least one candidate")
  require(cands.forall(_.length == cands(0).length),
    "MinL2Dist candidates must share one dimension")

  // All candidates share this dimension, and every input row must
  // match it: the declarative lowering this expression is spec-pinned
  // to (zip_with null-pads a length mismatch → null distance, skipped
  // by array_min) would silently diverge on mismatched dims, so a
  // mismatch fails loudly instead of truncating the distance.
  private val dim: Int = cands(0).length

  override def dataType: DataType = DoubleType

  override def prettyName: String = "min_l2_dist"

  // same bulk-copy threshold + rationale as NearestCentroid: above ~16
  // candidates one toDoubleArray beats k·d megamorphic getDouble calls
  private def bulkCopy: Boolean = cands.length >= 16

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nElems = arr.numElements()
    if (nElems != dim) throw new IllegalArgumentException(
      s"min_l2_dist: input dimension $nElems != candidate dimension $dim")
    var bestD = Double.MaxValue
    val local: Array[Double] = if (bulkCopy) arr.toDoubleArray() else null
    var i = 0
    while (i < cands.length) {
      val c = cands(i)
      var d = 0.0
      var j = 0
      if (local != null) {
        while (j < dim) {
          val diff = local(j) - c(j)
          d += diff * diff
          j += 1
        }
      } else {
        while (j < dim) {
          val diff = arr.getDouble(j) - c(j)
          d += diff * diff
          j += 1
        }
      }
      if (d < bestD) bestD = d
      i += 1
    }
    math.sqrt(bestD)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cs = ctx.addReferenceObj("cands", cands, "double[][]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nElems = ctx.freshName("nElems")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val v = ctx.freshName("v")
      val read = if (bulkCopy) s"$v[$j]" else s"$arr.getDouble($j)"
      val copy = if (bulkCopy) s"double[] $v = $arr.toDoubleArray();" else ""
      s"""
         |double $bestD = Double.MAX_VALUE;
         |int $nElems = $arr.numElements();
         |if ($nElems != $dim) throw new IllegalArgumentException(
         |  "min_l2_dist: input dimension " + $nElems +
         |  " != candidate dimension " + $dim);
         |$copy
         |for (int $i = 0; $i < $cs.length; $i++) {
         |  double[] $c = $cs[$i];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    double $diff = $read - $c[$j];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) $bestD = $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($bestD);
       """.stripMargin
    })

  // value equality + cached matrix hash — the NearestCentroid/ProbeCells
  // contract (plan-cache and exchange-reuse compare by value; Array
  // fields default to reference equality)
  @transient private lazy val matrixHash: Int =
    java.util.Arrays.deepHashCode(cands.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case p: MinL2Dist =>
      child == p.child && matrixHash == p.matrixHash &&
        java.util.Arrays.deepEquals(cands.asInstanceOf[Array[AnyRef]],
          p.cands.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(matrixHash))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinL2Dist {
  /** Column-API entry point. */
  def apply(vec: Column, cands: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      new MinL2Dist(GraftSqlBridge.expression(vec), cands))
}
