package graft

import org.apache.spark.sql.functions._

import graft.expressions.RoundHalfUp

/** RoundHalfUp must equal Spark's built-in `round(x, s)` for EVERY
  * double — the expression exists to remove the built-in's per-row
  * BigDecimal from candidate-scoring streams, not to change a single
  * value: the rounded score is the cross-engine ordering contract the
  * DuckDB oracles replay, so one divergent value is a correctness bug,
  * not noise. The fuzz deliberately stresses the fast/slow boundary:
  * exact decimal halves (positive and negative), values a half-ulp off
  * a half, magnitudes from subnormal to 1e300 (the |y| ≥ 2^51 fallback),
  * and the non-finite passthroughs. */
class RoundHalfUpSpec extends SparkSessionSpec {

  private def assertMatches(df: org.apache.spark.sql.DataFrame,
                            scale: Int): Unit = {
    val mismatches = df
      .withColumn("builtin", round(col("x"), scale))
      .withColumn("native", RoundHalfUp(col("x"), scale))
      // NaN-safe comparison: <=> treats NaN as equal to itself
      .where(!(col("builtin") <=> col("native")))
    val bad = mismatches.limit(5).collect()
    assert(bad.isEmpty,
      s"scale=$scale diverges on: ${bad.mkString("; ")}")
  }

  test("adversarial values: halves, near-halves, specials, magnitudes") {
    import spark.implicits._
    val halves = (-2000 to 2000).map(_ * 0.5e-6) // exact decimal halves at scale 6
    val nearHalves = (-50 to 50).flatMap { i =>
      val h = i * 0.5e-6
      Seq(Math.nextUp(h), Math.nextDown(h), h + 1e-13, h - 1e-13)
    }
    val magnitudes = (-320 to 300).map(e => math.pow(10.0, e)) ++
      (-320 to 300).map(e => -math.pow(10.0, e))
    val specials = Seq(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue,
      -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
      2.251799813685248e15, Math.nextDown(2.251799813685248e15))
    val df = (halves ++ nearHalves ++ magnitudes ++ specials).toDF("x")
    for (s <- Seq(0, 1, 6, 9, 15)) assertMatches(df, s)
  }

  test("fuzz: 4M seeded doubles across the cosine-score range and beyond") {
    // three regimes: cosine-like [-1.5, 1.5], wide exponents, and
    // values manufactured to sit ~1 ulp around scaled halves
    val cosLike = spark.range(2000000)
      .select((rand(7) * 3.0 - 1.5).as("x"))
    val wide = spark.range(1000000)
      .select((randn(11) * pow(lit(10.0), (rand(13) * 24 - 12))).as("x"))
    val nearHalf = spark.range(1000000)
      .select(((floor(rand(17) * 2000000) - 1000000 + 0.5) / 1e6 +
        (rand(19) - 0.5) * 2e-13).as("x"))
    for (df <- Seq(cosLike, wide, nearHalf)) assertMatches(df, 6)
    assertMatches(wide, 2)
  }
}
