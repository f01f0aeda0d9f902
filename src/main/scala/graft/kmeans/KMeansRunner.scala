package graft.kmeans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Result of a full k-means run. `iterations` is the reference driver's
  * final `iter` value: on convergence the reference breaks BEFORE the
  * increment (KMeans.java:176-183), so a run converging on round N
  * reports N; a run hitting the bound reports maxIter (having run
  * maxIter−1 rounds). `iterations` is also the index of the last
  * per-round output directory the reference would have written when
  * converged; `lastRound` gives that index in every case. */
final case class KMeansResult(
    centroids: Array[Array[Double]],
    iterations: Int,
    finalError: Double,
    errorLog: Seq[Double],
    reinitCount: Int,
    converged: Boolean) {
  /** Index of the last executed round (= the reference's last job output
    * dir suffix); 0 when no round ran (maxIter = 1). */
  def lastRound: Int = if (converged) iterations else iterations - 1
}

/** The iterative driver loop — Spark re-expression of the reference's
  * `KMeans.main` (/root/reference/kmeans/.../KMeans.java:95-194).
  *
  * Faithful observable semantics:
  *  - `iter` starts at 1 and the loop runs `while (iter < maxIter)`, i.e.
  *    at most maxIter−1 rounds (KMeans.java:113,130 — reproduced
  *    deliberately: convergence counts are observable behavior);
  *  - init = k-point sample without replacement (KMeans.java:276-312),
  *    but SEEDED for reproducibility (the reference's unseeded
  *    `new Random()` at KMeans.java:284 is a documented quirk we fix) and
  *    computed distributedly (orderBy(rand)·limit k) instead of the
  *    reference's O(n) driver-memory read (KMeans.java:292-298 — the
  *    anti-pattern that would OOM at 100 TB);
  *  - empty cluster ⇒ discard the round, re-initialize ALL k centroids
  *    from a fresh sample, skip the error check, still count the
  *    iteration (KMeans.java:167-171; Doc CC pdf §2.0.1);
  *  - stop when Σ‖Δcᵢ‖ < eps (KMeans.java:174-179).
  *
  * Scale posture vs the reference: the input is cached once and each
  * round is ONE job (narrow assign → partial agg → k-row shuffle → final
  * agg → collect of k·(d+1) values). The reference re-reads the input
  * from HDFS and launches a fresh MR job every round (~22 s fixed
  * overhead per its own §3 evaluation); on a 1000-executor cluster this
  * loop's per-round cost is one shuffle of k·d·#partitions doubles.
  */
object KMeansRunner {

  def run(points: DataFrame, vecCol: String, k: Int, maxIter: Int,
          eps: Double, seed: Long,
          cache: Boolean = true): KMeansResult = {
    // maxIter = 1 is legal and runs ZERO rounds, like the reference's
    // `while (1 < 1)` (KMeans.java:130): result = the seeded sample.
    require(k > 0 && maxIter >= 1)
    val pts =
      if (cache) points.persist(StorageLevel.MEMORY_AND_DISK)
      else points
    try runLoop(pts, vecCol, k, maxIter, eps, seed,
      sampleCentroids(pts, vecCol, k, _), identity)
    finally if (cache) { pts.unpersist(); () }
  }

  /** ORACLE-REPLAYABLE variant of [[run]]: identical loop semantics,
    * but (a) the seed sample orders by a multiplicative hash of the
    * INTEGER id column instead of xxhash64 of the vector — the same
    * seeded, layout-independent selection, now computable by any SQL
    * engine — and (b) each round's new centroids are quantized to
    * `roundDp` decimals (Spark `round` semantics: HALF_UP over the
    * shortest decimal representation) BEFORE the shift test, so both
    * engines enter every round from bit-identical centroids and
    * float-summation-order divergence cannot compound across rounds.
    * This is what lets a DuckDB recursive CTE replay the whole seeded
    * Lloyd recursion value-exactly (the kmeans_full oracle). */
  def runReplayable(points: DataFrame, vecCol: String, idCol: String,
                    k: Int, maxIter: Int, eps: Double, seed: Long,
                    roundDp: Int = 6,
                    cache: Boolean = true): KMeansResult = {
    require(k > 0 && maxIter >= 1)
    val pts =
      if (cache) points.persist(StorageLevel.MEMORY_AND_DISK)
      else points
    try runLoop(pts, vecCol, k, maxIter, eps, seed,
      idHashSampleCentroids(pts, vecCol, idCol, k, _),
      _.map(_.map(roundHalfUp(_, roundDp))))
    finally if (cache) { pts.unpersist(); () }
  }

  /** Spark-`round`-compatible decimal rounding (BigDecimal over the
    * shortest decimal representation, HALF_UP). */
  def roundHalfUp(x: Double, dp: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Seeded k-sample keyed on a multiplicative hash of an integer id:
    * `(id · 2654435761 + seed · 40503) mod (2³¹−1)`, ties on id — the
    * Knuth-style scramble every SQL engine can reproduce exactly in
    * 64-bit integer arithmetic. Same one-pass TakeOrderedAndProject
    * shape as [[sampleCentroids]]. */
  def idHashSampleCentroids(points: DataFrame, vecCol: String,
                            idCol: String, k: Int,
                            seed: Long): Array[Array[Double]] =
    points.select(col(vecCol), col(idCol))
      .orderBy(pmod(col(idCol) * lit(2654435761L) + lit(seed * 40503L),
        lit(2147483647L)), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(rowVec)

  /** Seeded k-sample without replacement, O(k) driver memory.
    * Ordered by a seeded content hash rather than `rand(seed)`: rand is
    * seeded PER PARTITION, so its sample changes with the partition
    * layout — a content hash gives the same k vectors on any cluster
    * size / split plan, which the oracle-reproducibility story
    * (SURVEY.md §7.4) requires. TakeOrderedAndProject keeps it one pass,
    * no full sort. */
  def sampleCentroids(points: DataFrame, vecCol: String, k: Int,
                      seed: Long): Array[Array[Double]] =
    points.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol), lit(seed)), col(vecCol))
      .limit(k)
      .collect()
      .map(rowVec)

  private def rowVec(r: Row): Array[Double] =
    r.getSeq[Double](0).toArray

  /** Loop body shared by [[run]] and [[runReplayable]]: `sample` draws
    * the (re-)init centroid set for a given seed; `post` is applied to
    * each round's new centroids before the shift test (identity for
    * the plain run, decimal quantization for the replayable one). */
  private def runLoop(pts: DataFrame, vecCol: String, k: Int, maxIter: Int,
                      eps: Double, seed: Long,
                      sample: Long => Array[Array[Double]],
                      post: Array[Array[Double]] => Array[Array[Double]])
      : KMeansResult = {
    var centroids = sample(seed)
    var iter = 1 // KMeans.java:113 — starts at 1 ⇒ at most maxIter−1 rounds
    var error = Double.NaN
    var reinits = 0
    val log = Seq.newBuilder[Double]
    var converged = false
    while (iter < maxIter && !converged) {
      val rows = KMeansOps.lloydRound(pts, vecCol, centroids).collect()
      // Spark's groupBy emits no row for an unseen key, unlike the
      // reference's always-k emission (KMeans.java:64-67): left-fill.
      val byId = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      if (byId.size < k) {
        // empty-cluster policy: full re-init, skip error check,
        // iteration still counts (KMeans.java:167-171).
        reinits += 1
        centroids = sample(seed + iter)
      } else {
        val newCentroids = post(Array.tabulate(k)(byId(_)))
        error = KMeansOps.shift(centroids, newCentroids)
        log += error
        centroids = newCentroids
        if (error < eps) converged = true
      }
      // the reference breaks BEFORE iter++ on convergence
      // (KMeans.java:176-183): the converged round keeps its own index
      if (!converged) iter += 1
    }
    KMeansResult(centroids, iter, error, log.result(), reinits, converged)
  }
}
