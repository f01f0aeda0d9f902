package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.kmeans.KMeansOps

/** Mini-batch streaming k-means over an unbounded point stream — the
  * streaming-native face of the engine's core algorithm (the reference
  * is batch-only; SURVEY.md §2.1 "Streaming: none").
  *
  * Each micro-batch runs ONE distributed Lloyd round (the same
  * assign → partial/final agg plan as the batch kernel, native
  * NearestCentroid assignment) and folds the per-cluster (sum, count)
  * into decay-weighted running centroids on the driver:
  *
  *   c ← (c·w·a + sum) / (w·a + n),   w ← w·a + n
  *
  * with decay factor a ∈ (0,1] — the classic streaming k-means update
  * (a=1: all history weighs equally; a→0: only the newest batch). The
  * driver state is k·(d+1) doubles; everything heavy is in the
  * distributed plan, so the operator scales exactly like one batch
  * Lloyd round per trigger.
  */
object StreamingKMeans {
  final case class State(centroids: Array[Array[Double]],
                         weights: Array[Double], batches: Long)
}

final class StreamingKMeans(k: Int, decay: Double,
                            init: Array[Array[Double]]) {
  import StreamingKMeans.State
  require(init.length == k && decay > 0 && decay <= 1.0)

  private val state = new AtomicReference(
    State(init.map(_.clone()), Array.fill(k)(0.0), 0L))

  def current: State = state.get()

  /** Fold one micro-batch (as (cluster → (sum, n)) rows) into the state. */
  private[streaming] def update(batch: DataFrame, vecCol: String): Unit = {
    val s = state.get()
    val rows = KMeansOps
      .lloydRound(batch, vecCol, s.centroids)
      .collect()
    if (rows.nonEmpty) {
      val cents = s.centroids.map(_.clone())
      val ws = s.weights.clone()
      rows.foreach { r =>
        val cid = r.getInt(0)
        val mean = r.getSeq[Double](1)
        val n = r.getLong(2).toDouble
        val wOld = ws(cid) * decay
        val wNew = wOld + n
        val c = cents(cid)
        var j = 0
        while (j < c.length) {
          // lloydRound returns the batch MEAN; fold as weighted average
          c(j) = (c(j) * wOld + mean(j) * n) / wNew
          j += 1
        }
        ws(cid) = wNew
      }
      // clusters unseen this batch only decay their weight
      (0 until k).foreach { cid =>
        if (!rows.exists(_.getInt(0) == cid)) ws(cid) = ws(cid) * decay
      }
      state.set(State(cents, ws, s.batches + 1))
    } else state.set(s.copy(batches = s.batches + 1))
  }

  /** Start consuming a streaming DataFrame of points. */
  def fit(stream: DataFrame, vecCol: String,
          trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        update(batch, vecCol)
      }
      .start()
}
