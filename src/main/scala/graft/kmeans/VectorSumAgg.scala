package graft.kmeans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing the ClusteringFeature (vector sum, count)
  * in ONE aggregation buffer — the large-d path for
  * [[KMeansOps.summarize]]. The per-dimension `sum(...)` formulation
  * generates d separate aggregate expressions, which is ideal for small
  * d (fully codegen'd) but bloats generated code as d grows into the
  * hundreds; this buffer is a single Array[Double] updated imperatively,
  * so plan size is O(1) in d. Same partial/final split on the wire:
  * `reduce` runs map-side, `merge` after the k-row shuffle — exactly the
  * reference's in-mapper combiner + reducer merge
  * (KMeans.java:36-67, ClusteringFeature.java:35-42).
  */
object VectorSumAgg {

  final case class SumCount(sum: Array[Double], n: Long)

  private object agg extends Aggregator[Seq[Double], SumCount, SumCount] {
    override def zero: SumCount = SumCount(Array.emptyDoubleArray, 0L)

    override def reduce(b: SumCount, v: Seq[Double]): SumCount =
      if (b.n == 0L) SumCount(v.toArray, 1L)
      else {
        val s = b.sum
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        SumCount(s, b.n + 1)
      }

    override def merge(a: SumCount, b: SumCount): SumCount =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val s = a.sum
        var i = 0
        while (i < s.length) { s(i) += b.sum(i); i += 1 }
        SumCount(s, a.n + b.n)
      }

    override def finish(r: SumCount): SumCount = r
    override def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
    override def outputEncoder: Encoder[SumCount] = Encoders.product[SumCount]
  }

  /** Column-API form: usable as `groupBy(...).agg(vecSum(col("v")))`. */
  val vecSum: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(agg)
}
