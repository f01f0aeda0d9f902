package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions.col

import graft.expressions.{NearestCentroid, PqEncodeCodes, ProbeCells}

/** Value-equality contract of the array-carrying native expressions.
  *
  * Catalyst compares ANALYZED/canonicalized trees with `==` for plan-
  * cache lookup (CacheManager) and exchange reuse — and every call
  * site collects its centroid/codebook arrays fresh from the corpus,
  * so the default case-class equality (REFERENCE equality on Array
  * fields) made two builds of the same expression never compare equal.
  * Measured cost before the fix: dedup_embed_cluster's persisted edge
  * set missed its cache on every warm run and rebuilt the whole KNN
  * graph — 22 s instead of 4 s at the x10 rung. These tests pin deep
  * content equality so the regression cannot silently return. */
class ExpressionEqualitySpec extends SparkSessionSpec {

  // one shared child: a fresh unresolved column carries a per-call
  // stack-trace Origin, which is a test artifact — in real plans the
  // children are resolved attributes that compare structurally
  private val expr = GraftSqlBridge.expression(col("x"))
  private def freshCents() = Array(Array(1.0, 2.0), Array(3.0, 4.0))

  test("content-equal fresh arrays compare equal (plan-cache contract)") {
    val (a, b) = (freshCents(), freshCents())
    assert(!(a eq b))
    assert(NearestCentroid(expr, a) == NearestCentroid(expr, b))
    assert(NearestCentroid(expr, a).semanticEquals(NearestCentroid(expr, b)))
    assert(new ProbeCells(expr, a, 2) == new ProbeCells(expr, b, 2))
    assert(new ProbeCells(expr, a, 2).semanticEquals(new ProbeCells(expr, b, 2)))
    assert(new PqEncodeCodes(expr, Array(a)) == new PqEncodeCodes(expr, Array(b)))
    assert(NearestCentroid(expr, a).hashCode ==
      NearestCentroid(expr, b).hashCode)
    assert(new ProbeCells(expr, a, 2).hashCode ==
      new ProbeCells(expr, b, 2).hashCode)
    assert(new PqEncodeCodes(expr, Array(a)).hashCode ==
      new PqEncodeCodes(expr, Array(b)).hashCode)
  }

  test("different content, different topN, different child stay unequal") {
    val a = freshCents()
    val c = Array(Array(1.0, 2.0), Array(3.0, 5.0))
    assert(NearestCentroid(expr, a) != NearestCentroid(expr, c))
    assert(new ProbeCells(expr, a, 2) != new ProbeCells(expr, c, 2))
    assert(new ProbeCells(expr, a, 2) != new ProbeCells(expr, a, 3))
    assert(new PqEncodeCodes(expr, Array(a)) != new PqEncodeCodes(expr, Array(c)))
    val other = GraftSqlBridge.expression(col("y"))
    assert(NearestCentroid(expr, a) != NearestCentroid(other, a))
  }

  test("a persisted subtree containing the native probe is REUSED by a " +
       "structurally-identical later query (the dedup_embed_cluster shape)") {
    val spark2 = spark
    import spark2.implicits._
    def build() = {
      val cents = freshCents() // fresh arrays per call, like every caller
      Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("id", "v")
        .withColumn("pc",
          graft.expressions.ProbeCells(col("v"), cents, 1))
    }
    val first = build().persist()
    try {
      first.count()
      val second = build()
      val reused = second.queryExecution.withCachedData.collect {
        case c: org.apache.spark.sql.execution.columnar.InMemoryRelation => c
      }
      assert(reused.nonEmpty,
        "the second build must resolve to the first's InMemoryRelation — " +
          "a cache miss here recomputes persisted subtrees on every reuse")
    } finally { first.unpersist(); () }
  }
}
