package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native `round(x, scale)` over doubles — bit-identical to Spark's
  * built-in `Round` (HALF_UP on the double's SHORTEST-DECIMAL value,
  * non-finite passthrough) without its per-row cost: the built-in's
  * double path allocates `BigDecimal.valueOf(x).setScale(...)` for
  * EVERY row, which profiled as the dominant frame of the candidate
  * scoring joins (200M rounds per knn-graph build at the x100 rung —
  * the rounding exists to give scores a cross-engine total order, see
  * the similarity operators, so it sits on the widest row streams the
  * engine produces).
  *
  * Fast path: pure double arithmetic `floor(x·10^s + 0.5) / 10^s`,
  * valid whenever the scaled value's fractional part is farther from
  * the .5 rounding boundary than the worst-case gap between the double
  * and its shortest-decimal value (|y|·2⁻⁵² — the guard band is 4.5×
  * that). Inside the band — where binary-vs-decimal disagreement is
  * possible — and for |y| ≥ 2⁵¹ (integer-resolution doubles), it falls
  * back to the built-in's exact BigDecimal computation, so the result
  * is equal to Spark's `round` for EVERY input (RoundHalfUpSpec
  * fuzzes the equivalence across magnitudes, exact halves, negative
  * halves and specials). The DuckDB oracles keep their `round(x, s)`
  * replay unchanged — this expression changes no value the built-in
  * would produce. */
case class RoundHalfUp(child: Expression, scale: Int)
  extends UnaryExpression {

  require(scale >= 0 && scale <= 15, s"scale $scale outside [0, 15]")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_round"

  override def nullSafeEval(input: Any): Any =
    RoundHalfUp.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RoundHalfUp.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RoundHalfUp {

  private val Pow = Array.tabulate(16)(i => math.pow(10.0, i))

  /** Static hot-loop kernel (JIT-inlined from the generated code). */
  def round(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val y = x * Pow(scale)
    val ay = math.abs(y)
    // beyond 2^51 the double grid is coarser than 0.5 — and the
    // fast-path error analysis needs y+0.5 to be meaningful
    if (ay >= 2.251799813685248e15) return slow(x, scale)
    val f = y - math.floor(y)
    // guard band: |shortest-decimal(x)·10^s − y| ≤ ~1.5·ulp(y); stay
    // 4.5× clear of the boundary before trusting binary arithmetic
    if (math.abs(f - 0.5) <= (ay + 1.0) * 4e-15) return slow(x, scale)
    math.floor(y + 0.5) / Pow(scale)
  }

  /** The built-in's exact path, for boundary and huge inputs. */
  private def slow(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column-API entry point. */
  def apply(c: Column, scale: Int): Column =
    GraftSqlBridge.column(new RoundHalfUp(GraftSqlBridge.expression(c), scale))
}
