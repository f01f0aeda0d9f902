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
  * valid whenever the scaled value y = x·10^s has a fractional part
  * farther from the .5 rounding boundary than the worst-case gap
  * between y and shortest-decimal(x)·10^s (< 4·ulp(y); the band is
  * 8·ulp). Inside the band — where binary-vs-decimal disagreement is
  * possible — and for |y| > 2⁴⁹ (the band swallows the unit interval;
  * from 2⁵¹ the double grid is coarser than the boundary itself), it
  * falls back to the built-in's exact BigDecimal computation, so the
  * result is equal to Spark's `round` for EVERY input (RoundHalfUpSpec
  * fuzzes the equivalence across magnitudes, exact halves, negative
  * halves and specials). Large-magnitude regime spelled out: columns
  * whose |x|·10^s routinely exceeds ~5.6e14 run at built-in speed,
  * not fast-path speed — acceptable because the engine's call sites
  * round SCORES (cosines, ratios, micro-nat logs: |y| ≤ ~1e9). The
  * supported scale domain is [0, 15] (Pow table; negative scales and
  * wider ones stay on Spark's Round). The DuckDB oracles keep their
  * `round(x, s)` replay unchanged — this expression changes no value
  * the built-in would produce. */
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
    // guard band: the gap between shortest-decimal(x)·10^s and y is
    // < 4·ulp(y) (≤0.5 ulp decimal-vs-binary on x, ≤2 ulp through the
    // exact-power multiply, ≤1 ulp computing f) — 8·ulp(ay+1) keeps a
    // 2× margin plus an absolute ~2e-15 floor for sub-unit y. ulp-
    // scaled, not |y|-scaled: the previous |y|·4e-15 band (~18 ulp)
    // crossed 0.5 at |y|≈1.2e14, silently sending EVERY larger row to
    // the BigDecimal slow path; ulp scaling holds the band at 16 ulp
    // of boundary width, so the slow-path regime starts at |y| > 2^49
    // — and above there it is the honest choice, since the double
    // grid is within a few bits of the 0.5 boundary resolution anyway
    if (math.abs(f - 0.5) <= 8.0 * Math.ulp(ay + 1.0)) return slow(x, scale)
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
