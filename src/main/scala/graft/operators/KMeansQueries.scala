package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Caches.TrackedDataset
import graft.Tables
import graft.functions.VectorFunctions._
import graft.kmeans.{KMeansOps, KMeansRunner}

/** t2-facing queries for the k-means core: each decomposed operator from
  * SURVEY.md §2 (O3-O5 assignment, O6-O8 summarize, O9 mean, O12 shift)
  * as a deterministic DataFrame query over `embeddings.parquet`, with a
  * matching DuckDB oracle.
  *
  * Determinism: the oracle cannot replay a seeded random init, so these
  * queries fix the centroids to the first K embeddings ordered by
  * `vec_id` (SURVEY.md §7.4). The seeded end-to-end run (`kmeans_full`)
  * has no SQL equivalent and gets the driver's rows-only check.
  */
object KMeansQueries {

  val K = 8
  val DIM = 64

  /** First k embeddings by vec_id, as a deterministic centroid set.
    * k·d doubles collected to the driver — the moral equivalent of the
    * reference shipping centroids via the Hadoop Configuration
    * (KMeans.java:152-157); they re-enter the plan as literals. */
  def firstKCentroids(spark: SparkSession, dir: String,
                      k: Int): Array[Array[Double]] =
    Tables.t(spark, dir, "embeddings")
      .select(toDoubleVec(col("embedding")).as("v"))
      .orderBy(col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  def fixedCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    firstKCentroids(spark, dir, K)

  /** Target within-cell population for the IVF coarse quantizer (the
    * [[graft.operators.Dedup.TargetCellSize]] rule, shared so the two
    * blocking families agree): coarse cells hold ~256 vectors each
    * whatever the corpus size. */
  val CoarseCellTarget = 256L

  /** n-scaled coarse cell count: k = max([[K]], ⌈n/[[CoarseCellTarget]]⌉).
    * A FIXED k makes every IVF candidate set Θ(n²/k) — quadratic once n
    * outgrows k·cellSize — and caps both the prune ratio (NProbe/k) and
    * the partition fan-out of a cell-partitioned index layout at k
    * forever. Growing k with n keeps per-cell population constant, so
    * candidate volume is O(n·NProbe·CellTarget) — linear — and the
    * index layout gains partitions (and thus write/search parallelism)
    * as the corpus grows. At the test SFs (n ≤ 2000) this evaluates to
    * exactly [[K]], so the seeded oracle replay is unchanged; at 100 TB
    * it is what makes the plan survive. */
  def coarseK(n: Long): Int =
    math.max(K.toLong, (n + CoarseCellTarget - 1) / CoarseCellTarget).toInt

  /** Deterministic n-scaled coarse centroid set for the IVF family
    * ([[Similarity.annIvfCosine]], [[Similarity.annKnnGraph]],
    * [[AnnIndex.buildIndex]], [[Pipeline.pipelineDiverseSample]]):
    * first [[coarseK]](n) embeddings by vec_id. The count() pre-pass is
    * a parquet-metadata read (no column scan); the seed collect is
    * O(k·d) driver doubles = O(n·d/256) — at extreme corpus sizes
    * (k ≳ 10⁶ cells) the centroid set should travel as a broadcast
    * DataFrame join instead of plan literals, the pattern
    * [[Dedup.dedupEmbedCosine]] already implements end-to-end in-plan;
    * the literal path here keeps the generated code compact for every
    * k the seeded-oracle harness can reach. */
  def coarseCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val n = Tables.cachedCount(spark, dir, "embeddings")
    firstKCentroids(spark, dir, coarseK(n))
  }

  /** DuckDB replay of [[coarseK]]: a LIMIT subquery deriving the cell
    * count from the same corpus count, so the oracle's centroid set
    * tracks the engine's at any SF. */
  val coarseKSql: String =
    s"(SELECT greatest($K, CAST(ceil(count(*) / $CoarseCellTarget.0) AS BIGINT)) FROM embeddings)"

  private def points(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))

  /** O3+O4+O5: per-point nearest-centroid assignment. Uses the
    * typedLit centroid path — compact generated code at any k·d
    * (see KMeansOps.distancesDyn). */
  def kmAssign(spark: SparkSession, dir: String): DataFrame =
    KMeansOps.assignDyn(points(spark, dir), "v", fixedCentroids(spark, dir))
      .select(col("vec_id"), col("cluster"))

  /** O6+O7+O8: cluster sizes (count side of the ClusteringFeature). */
  def kmSizes(spark: SparkSession, dir: String): DataFrame =
    KMeansOps.assignDyn(points(spark, dir), "v", fixedCentroids(spark, dir))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))

  /** One full Lloyd round (assign → sum/count → mean): the flagship.
    * Output as (cluster, dim, value, n) scalar rows — posexplode of the
    * centroid vector — because the driver's checker sorts rows with
    * pandas and cannot hash array-typed cells. Values rounded so Spark's
    * and DuckDB's float-summation orders agree (SURVEY.md §7.4). */
  def kmUpdate(spark: SparkSession, dir: String): DataFrame =
    KMeansOps.lloydRound(points(spark, dir), "v", fixedCentroids(spark, dir))
      .select(col("cluster"), col("n"),
        posexplode(col("centroid")).as(Seq("pos", "v")))
      .select(col("cluster"),
        (col("pos") + 1).cast("int").as("dim"),
        round(col("v"), 6).as("value"),
        col("n"))

  /** O12: Σ‖Δcᵢ‖ between the fixed centroids and the one-round update —
    * exercised as a broadcast join of the k-row centroid table against
    * the k-row aggregate. */
  def kmShift(spark: SparkSession, dir: String): DataFrame = {
    val cents = fixedCentroids(spark, dir)
    val spark2 = spark
    import spark2.implicits._
    val oldDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "old_centroid")
    val updated = KMeansOps.lloydRound(points(spark, dir), "v", cents)
    updated.join(broadcast(oldDf), "cluster")
      .agg(round(sum(l2Dist(col("centroid"), col("old_centroid"))), 6)
        .as("total_shift"))
  }

  /** K-means cost (inertia): Σ over points of min squared distance —
    * the scalar-fold view of O3/O4. */
  def kmCost(spark: SparkSession, dir: String): DataFrame = {
    val cents = fixedCentroids(spark, dir)
    points(spark, dir)
      .select(array_min(KMeansOps.distancesDyn(col("v"), cents)).as("d2"))
      .agg(round(sum(col("d2")), 4).as("inertia"))
  }

  /** Full seeded iterative run (O11-O14), now ORACLE-CHECKED: the
    * [[KMeansRunner.runReplayable]] variant seeds by a multiplicative
    * id hash and quantizes each round's centroids to 6dp, which lets a
    * DuckDB recursive CTE replay the entire seeded Lloyd recursion
    * (per-level argmin assignment → rounded group means → Σ‖Δc‖ stop
    * test) value-exactly — the retrieval_mmr technique applied to the
    * flagship. Caveat (documented, spec-gated elsewhere): the oracle
    * does not model the empty-cluster re-init branch, which this data
    * never triggers with k=8 seeded from distinct points. Emitted as
    * (cluster, dim, value) scalar rows (array cells crash the driver's
    * pandas row sort). */
  def kmeansFull(spark: SparkSession, dir: String): DataFrame = {
    val res = KMeansRunner.runReplayable(points(spark, dir), "v", "vec_id",
      k = K, maxIter = 20, eps = 0.01, seed = 42L)
    val spark2 = spark
    import spark2.implicits._
    res.centroids.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (x, j) =>
        (i, j + 1, math.rint(x * 1e6) / 1e6)
      }
    }.toSeq.toDF("cluster", "dim", "value")
  }

  val BisectK = 4
  val BisectRounds = 3

  /** BISECTING K-MEANS (Steinbach/Karypis/Kumar, KDD'00 workshop) —
    * the divisive variant every clustering library ships next to
    * Lloyd: start with one cluster, repeatedly 2-means-split the
    * LARGEST cluster (ties → smallest label) until [[BisectK]]
    * clusters exist. Each split runs a fixed [[BisectRounds]]-round
    * seeded 2-means: seeds are the cluster's first two points in the
    * runReplayable id-hash order, per-round means quantize to 6dp
    * (the kmeans_full parity rules), assignment ties go to child 0
    * (the strict-argmin O4 rule), and an empty child keeps its
    * previous centroid — every branch deterministic, so the DuckDB
    * oracle replays the WHOLE divisive tree value-exactly with the
    * splits and rounds unrolled as chained CTEs.
    *
    * Scale shape: per round ONE scan of the target cluster's points
    * (hash-partitioned membership join) into the k=2 partial/final
    * aggregate — the O6-O8 shape; the labels relation is n-sized,
    * re-checkpointed once per split; the driver holds only 2·d
    * doubles and the loop counters. Total work ≈ Lloyd with k=2 per
    * level — the classic bisecting win: splits touch ever-smaller
    * subsets while quality tracks full k-means. */
  def kmeansBisecting(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pts = points(spark, dir).persistTracked()
    val hashOrd = ((col("vec_id") * lit(2654435761L) + lit(42L * 40503L))
      % lit(2147483647L)).asc
    var labels = pts.select(col("vec_id")).withColumn("lab", lit(0))
      .localCheckpoint(true)
    for (s <- 1 until BisectK) {
      val tgt = labels.groupBy(col("lab")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("lab")).limit(1)
        .collect()(0).getInt(0)
      val sub = pts.join(labels.where(col("lab") === tgt), "vec_id")
        .select(col("vec_id"), col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var cents = sub.orderBy(hashOrd, col("vec_id").asc).limit(2)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      for (_ <- 1 to BisectRounds) {
        val upd = KMeansOps.lloydRound(sub, "v", cents)
          .select(col("cluster"),
            transform(col("centroid"), x => round(x, 6)).as("centroid"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        // an empty child keeps its previous centroid (deterministic,
        // mirrored by the oracle's coalesce)
        cents = Array(upd.getOrElse(0, cents(0)), upd.getOrElse(1, cents(1)))
      }
      val child = KMeansOps.assignDyn(sub, "v", cents)
        .select(col("vec_id"), col("cluster").as("child"))
      labels = labels.join(child, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("child") === 1, lit(s)).otherwise(col("lab")).as("lab"))
        .localCheckpoint(true)
      sub.unpersist()
    }
    val outDf = pts.join(labels, "vec_id")
      .select(col("lab"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("lab"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .select(col("lab").cast("int").as("cluster"),
        (col("pos") + 1).cast("int").as("dim"),
        round(col("sx") / col("n"), 6).as("value"),
        col("n"))
    outDf
  }

  /** k-means‖ oversampling factor (Bahmani et al., VLDB'12 use l = 2k)
    * and round count. */
  val KmparL = 16L
  val KmparRounds = 3

  /** Int64 headroom ceiling for the cross-multiplied integer samplers:
    * u₂₀·φ must stay below 2⁶³ with u₂₀ < 2²⁰, so φ < 2⁴³. */
  private[graft] val SamplerHeadroomMax = 1L << 43

  /** In-plan guard for the sampler headroom: errors the JOB the moment
    * a φ aggregate crosses [[SamplerHeadroomMax]] instead of letting
    * u₂₀·φ wrap Int64 and silently corrupt every sampling decision
    * downstream. `assert_true` is NULL on pass, so `guard.isNull`
    * composes into a WHERE clause without changing its value — the
    * check rides the existing scan, costing no extra job or collect. */
  private[graft] def samplerHeadroomGuard(phi: Column): Column =
    assert_true(phi < lit(SamplerHeadroomMax),
      lit(s"sampler headroom exhausted: phi >= 2^43 would wrap the " +
        s"Int64 cross-multiplied inequality; coarsen the micro-nat " +
        s"scale (1e6 -> 1e3) or the draw width (u20 -> u10)")).isNull

  /** K-MEANS‖ SCALABLE INITIALIZATION (Bahmani et al., VLDB 2012) — the
    * published answer to "k-means++ init doesn't scale": instead of k
    * sequential passes each picking ONE center, run [[KmparRounds]]
    * passes that each sample ~[[KmparL]] centers INDEPENDENTLY with
    * probability min(1, l·d²(x,C)/φ), then weight the oversampled
    * candidate set by how many points each candidate owns (a driver-side
    * recluster of the tiny weighted set finishes the job —
    * [[reclusterWeighted]]). Every round is one scan: distances to the
    * broadcast candidate set (plan literals, the O5 pattern), a 1-row φ
    * aggregate joined back broadcast, and an O(l) collect of sampled
    * rows — driver state is O(l·rounds·d), never data-sized.
    *
    * Determinism/parity: d²ₘ = round((min distance)²·1e6) per point
    * (the distance double is bit-identical to DuckDB's list_distance —
    * the kmeans_full precedent), φₘ = exact integer Σ d²ₘ, and the
    * sampling test is the cross-multiplied integer inequality
    * u₂₀·φₘ < l·d²ₘ·2²⁰ with u₂₀ a 20-bit domain-separated md5 draw —
    * the weighted-sampler rule, so the whole cascade of sampling
    * decisions replays exactly. Already-chosen points have d²ₘ = 0 and
    * can never resample; p ≥ 1 keeps unconditionally (rhs ≥ u·φ for
    * every u). Output: each candidate with the round that added it and
    * its owned-point weight.
    *
    * Int64 headroom: u₂₀·φₘ must stay below 2⁶³, i.e. φₘ < 2⁴³ ≈
    * 8.8e12 — ample for any tested SF (φₘ ≈ n · d²·1e6), but a
    * trillion-scale corpus would cross it; the knob is the micro-nat
    * scale (drop 1e6 → 1e3) or the draw width (u₂₀ → u₁₀), both of
    * which only coarsen sampling granularity, never correctness. The
    * same headroom rule governs the token-budget and weighted
    * samplers. */
  def kmeansParInit(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
      .persistTracked()
    // seed: first point in the runReplayable id-hash order (O11's seed
    // rule reused, so the oracle replays it with the same expression)
    val hashOrd = ((col("vec_id") * lit(2654435761L) + lit(42L * 40503L))
      % lit(2147483647L)).asc
    val seed = pts.orderBy(hashOrd, col("vec_id").asc).limit(1).collect()(0)
    var cands = Vector[(Long, Array[Double], Int)](
      (seed.getLong(0), seed.getSeq[Double](1).toArray, 0))
    // the running min-d² CARRIES across rounds: round r only measures
    // distances to the candidates round r−1 ADDED (≈ l vectors) and
    // folds them into the materialized dmin — min(min(prev), min(new))
    // is bit-identical to min over the full candidate list (each
    // pairwise distance is the same expression; double min is exact),
    // so the oracle's recursive replay is untouched. Without the
    // carry, round r recomputed ALL 1+l·(r−1) distances over the full
    // corpus — measured 38 s at sf1, ~halved by folding each round's
    // work to the new candidates only. localCheckpoint materializes
    // the (id, v, dmin) relation per round: corpus-linear state, the
    // qSssp loop discipline, cleaned by the ContextCleaner.
    // distance kernels run as the NATIVE expressions ([[MinL2Dist]] /
    // [[NearestCentroid]]): the declarative transform-over-candidates
    // form evaluates an interpreted lambda per (row × candidate ×
    // dimension) — at the x100 rung that interpreted tax, not the
    // scans, dominated the 128 s wall (the PqEncodeCodes finding,
    // VERDICT r16 item 3). Bitwise parity with the declarative
    // lowering is spec-pinned (MinL2DistSpec), so the recursive-CTE
    // oracle replays unchanged.
    var cur = pts
      .withColumn("dmin",
        graft.expressions.MinL2Dist(col("v"), Array(cands.head._2)))
      .localCheckpoint(true)
    for (r <- 1 to KmparRounds) {
      val withD = cur.withColumn("d2m",
        round(col("dmin") * col("dmin") * lit(1e6d)).cast("long"))
      val phi = withD.agg(sum(col("d2m")).as("phim"))
      val u20 = conv(substring(md5(concat(lit(s"kmpar:$r:"),
        col("vec_id").cast("string"))), 1, 5), 16, 10).cast("long")
      val sampled = withD.crossJoin(broadcast(phi))
        .where(samplerHeadroomGuard(col("phim")) &&
          u20 * col("phim") < lit(KmparL * 1048576L) * col("d2m"))
        .select(col("vec_id"), col("v"))
        .orderBy(col("vec_id")).collect()
      cands ++= sampled.map(row =>
        (row.getLong(0), row.getSeq[Double](1).toArray, r))
      if (r < KmparRounds && sampled.nonEmpty) {
        val newCands = sampled
          .map(_.getSeq[Double](1).toArray).toArray
        cur = cur
          .withColumn("dmin", least(col("dmin"),
            graft.expressions.MinL2Dist(col("v"), newCands)))
          .localCheckpoint(true)
      }
    }
    // ownership weights: nearest candidate, ties → first in candidate
    // order (strict-< argmin, the O4 rule) — the native
    // [[NearestCentroid]] kernel (argmin over d², which selects the
    // same candidate as argmin over the oracle's sqrt distances: sqrt
    // is monotone, and the km_assign family has pinned this d²-vs-
    // list_distance equivalence against DuckDB since round 1)
    val owned = pts
      .withColumn("pos",
        (graft.expressions.NearestCentroid(col("v"),
          cands.map(_._2).toArray) + 1).cast("int"))
      .groupBy(col("pos")).agg(count(lit(1)).as("weight"))
    val spark2 = spark
    import spark2.implicits._
    val candDf = cands.zipWithIndex
      .map { case ((vid, _, r), i) => (vid, r, i + 1) }
      .toDF("vec_id", "r_added", "pos")
    candDf.join(owned, Seq("pos"), "left")
      .select(col("vec_id"), col("r_added").cast("int").as("r_added"),
        coalesce(col("weight"), lit(0L)).as("weight"))
  }

  /** Mini-batch rounds and the deterministic batch selector modulus
    * (~1/[[MbMod]] of the corpus per round). */
  val MbRounds = 5
  val MbMod = 4L

  /** MINI-BATCH K-MEANS (Sculley, WWW 2010) — the web-scale Lloyd
    * variant: each round touches only a deterministic ~25% hash-sample
    * of the corpus, and centers blend the batch per-cluster mean with
    * the accumulated per-center mass, c ← (c·n + Σ_B x)/(n + |B_c|) —
    * the aggregation-order-free form of Sculley's per-sample rule, so
    * the update is a pure partial/final aggregate (the O6-O8 shape)
    * instead of a sequential fold. Batch membership is a domain-
    * separated 20-bit md5 draw mod [[MbMod]] — replayable, layout-
    * independent — and each round's blended centers quantize to 6dp
    * (the kmeans_full parity rule) before becoming the next round's
    * plan literals. Per round: ONE scan of the batch slice, one k·d
    * exchange, a k-row collect; driver state k·d doubles. Output:
    * final (cluster, dim, value, n_seen) scalar rows. */
  def kmeansMiniBatch(spark: SparkSession, dir: String): DataFrame = {
    val pts = points(spark, dir)
    var cents = fixedCentroids(spark, dir)
    val counts = Array.fill(K)(0L)
    for (t <- 1 to MbRounds) {
      val inBatch = conv(substring(md5(concat(lit(s"mb:$t:"),
        col("vec_id").cast("string"))), 1, 5), 16, 10).cast("long")
        .%(lit(MbMod)) === lit(0L)
      cents = miniBatchRound(pts.where(inBatch), cents, counts)
    }
    val spark2 = spark
    import spark2.implicits._
    cents.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (x, j) => (i, j + 1, x, counts(i)) }
    }.toSeq.toDF("cluster", "dim", "value", "n_seen")
  }

  /** One mini-batch blend step, shared by the batch rounds and the
    * streaming updater ([[graft.streaming.StreamingOps
    * .kmeansUpdateStream]]): assign `batch` (a (vec_id, v) frame) to
    * the current centers, aggregate per-cluster (Σx, count) — ONE
    * partial/final pair, k·d on the wire — and fold into the
    * accumulated mass with 6dp quantization. Mutates `counts` in
    * place, returns the blended centers; clusters the batch missed
    * pass through untouched. */
  def miniBatchRound(batch: DataFrame, cents: Array[Array[Double]],
                     counts: Array[Long]): Array[Array[Double]] = {
    val sums = KMeansOps.summarize(
      KMeansOps.assignDyn(batch, "v", cents), "v", cents.head.length)
      .collect()
      .map(r => (r.getInt(0), (r.getSeq[Double](1).toArray, r.getLong(2))))
      .toMap
    val next = cents.zipWithIndex.map { case (c, i) =>
      sums.get(i) match {
        case Some((s, m)) =>
          val n = counts(i)
          c.zipWithIndex.map { case (x, j) =>
            graft.kmeans.KMeansRunner.roundHalfUp(
              (x * n + s(j)) / (n + m), 6)
          }
        case None => c
      }
    }
    for (i <- cents.indices)
      counts(i) += sums.get(i).map(_._2).getOrElse(0L)
    next
  }

  /** Bahmani step 7: recluster the weighted candidate set down to k on
    * the driver — the set is O(l·rounds) whatever the corpus size, so
    * this is k-means++-style seeding (greedy farthest-weighted pick)
    * plus weighted Lloyd on a handful of rows. Deterministic: seeding
    * scans candidates in order, Lloyd ties break to the lowest index.
    * Spec-gated ([[graft.KMeansSpec]]); the distributed product — the
    * candidate set itself — is what the oracle pins. */
  def reclusterWeighted(cands: Seq[(Array[Double], Long)], k: Int,
                        maxIter: Int = 20): Array[Array[Double]] = {
    require(cands.nonEmpty && cands.exists(_._2 > 0))
    val d = cands.head._1.length
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // greedy weighted farthest-point seeding (deterministic k-means++)
    val centers = scala.collection.mutable.ArrayBuffer(
      cands.maxBy(_._2)._1.clone())
    while (centers.size < math.min(k, cands.size)) {
      val next = cands.maxBy { case (v, w) =>
        w.toDouble * centers.map(sq(v, _)).min
      }
      centers += next._1.clone()
    }
    // weighted Lloyd
    var it = 0
    var moved = true
    while (moved && it < maxIter) {
      val sums = Array.fill(centers.size)(Array.ofDim[Double](d))
      val ws = Array.ofDim[Long](centers.size)
      cands.foreach { case (v, w) =>
        var best = 0; var bd = sq(v, centers(0))
        var j = 1
        while (j < centers.size) {
          val dj = sq(v, centers(j))
          if (dj < bd) { bd = dj; best = j }
          j += 1
        }
        ws(best) += w
        var i = 0
        while (i < d) { sums(best)(i) += v(i) * w; i += 1 }
      }
      moved = false
      for (j <- centers.indices if ws(j) > 0) {
        val nc = sums(j).map(_ / ws(j))
        if (!java.util.Arrays.equals(nc, centers(j))) {
          moved = true; centers(j) = nc
        }
      }
      it += 1
    }
    centers.map(_.clone()).toArray
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "km_assign" -> kmAssign,
    "km_sizes" -> kmSizes,
    "km_update" -> kmUpdate,
    "km_shift" -> kmShift,
    "km_cost" -> kmCost,
    "kmeans_par_init" -> kmeansParInit,
    "kmeans_minibatch" -> kmeansMiniBatch,
    "kmeans_bisecting" -> kmeansBisecting,
    "kmeans_full" -> kmeansFull)

  /** Shared oracle CTEs: deterministic centroids + assignment.
    * DuckDB lists are 1-based like Spark's element_at; `list_distance`
    * is Euclidean, monotone with the engine's squared distance, and the
    * (distance, cid) ordering reproduces the strict-< lowest-index
    * tie-break. */
  private val centsCte =
    s"""WITH cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
       |         CAST(embedding AS DOUBLE[]) AS c
       |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $K)
       |), assigned AS (
       |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
       |         (SELECT c.cid FROM cents c
       |          ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.c), c.cid
       |          LIMIT 1) AS cluster
       |  FROM embeddings e
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "km_assign" ->
      s"""$centsCte
         |SELECT vec_id, cluster FROM assigned""".stripMargin,
    "km_sizes" ->
      s"""$centsCte
         |SELECT cluster, count(*) AS n FROM assigned GROUP BY cluster""".stripMargin,
    "km_update" ->
      s"""$centsCte
         |SELECT cluster, CAST(dim AS INT) AS dim,
         |       round(sum(v[dim]) / count(*), 6) AS value,
         |       count(*) AS n
         |FROM assigned CROSS JOIN generate_series(1, $DIM) AS g(dim)
         |GROUP BY cluster, dim""".stripMargin,
    "km_shift" ->
      s"""$centsCte, upd AS (
         |  SELECT cluster, list(m ORDER BY dim) AS centroid
         |  FROM (
         |    SELECT cluster, dim, sum(v[dim]) / count(*) AS m
         |    FROM assigned CROSS JOIN generate_series(1, $DIM) AS g(dim)
         |    GROUP BY cluster, dim)
         |  GROUP BY cluster)
         |SELECT round(sum(list_distance(u.centroid, c.c)), 6) AS total_shift
         |FROM upd u JOIN cents c ON u.cluster = c.cid""".stripMargin,
    "km_cost" ->
      s"""$centsCte
         |SELECT round(sum(d2), 4) AS inertia FROM (
         |  SELECT (SELECT min(list_distance(a.v, c.c) ** 2) FROM cents c) AS d2
         |  FROM assigned a)""".stripMargin,
    // k-means‖ replayed: the candidate list accumulates through the
    // recursion (seed by the same id-hash order), each round re-derives
    // d²ₘ against the CURRENT list, φₘ as the exact integer sum, and the
    // cross-multiplied 20-bit md5 sampling test; ownership weights by
    // the (distance, position) argmin over the final list
    "kmeans_par_init" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), seed AS (
         |  SELECT list(struct_pack(vid := vec_id, c := v, r := 0)) AS cands
         |  FROM (
         |    SELECT vec_id, v FROM e
         |    ORDER BY (vec_id * 2654435761 + 42 * 40503) % 2147483647,
         |             vec_id
         |    LIMIT 1)
         |), iter AS (
         |  SELECT 0 AS r, (SELECT cands FROM seed) AS cands
         |  UNION ALL
         |  SELECT s.r + 1,
         |    CASE WHEN nxt.newc IS NULL THEN s.cands
         |         ELSE s.cands || nxt.newc END
         |  FROM iter s, LATERAL (
         |    WITH d0 AS (
         |      SELECT e.vec_id, e.v,
         |        (SELECT min(list_distance(e.v, u.c))
         |         FROM (SELECT unnest(s.cands) AS u)) AS dmin
         |      FROM e
         |    ), dm AS (
         |      SELECT vec_id, v,
         |        CAST(round(dmin * dmin * 1e6) AS BIGINT) AS d2m
         |      FROM d0
         |    ), phi AS (
         |      SELECT CAST(sum(d2m) AS BIGINT) AS phim FROM dm
         |    )
         |    SELECT list(struct_pack(vid := vec_id, c := v, r := s.r + 1)
         |                ORDER BY vec_id) AS newc
         |    FROM dm, phi
         |    WHERE CAST(concat('0x', substr(md5(concat('kmpar:',
         |            CAST(s.r + 1 AS VARCHAR), ':',
         |            CAST(vec_id AS VARCHAR))), 1, 5)) AS BIGINT) * phim
         |          < ${KmparL * 1048576L} * d2m
         |  ) nxt
         |  WHERE s.r < $KmparRounds
         |), fin AS (
         |  SELECT cands FROM iter ORDER BY r DESC LIMIT 1
         |), cl AS (
         |  SELECT g.i AS pos, fin.cands[g.i].vid AS vid,
         |         fin.cands[g.i].r AS r_added, fin.cands[g.i].c AS c
         |  FROM fin, generate_series(1, 100000) g(i)
         |  WHERE g.i <= len(fin.cands)
         |), own AS (
         |  SELECT (SELECT cl.pos FROM cl
         |          ORDER BY list_distance(e.v, cl.c), cl.pos
         |          LIMIT 1) AS pos
         |  FROM e
         |), w AS (
         |  SELECT pos, count(*) AS weight FROM own GROUP BY pos
         |)
         |SELECT cl.vid AS vec_id, CAST(cl.r_added AS INT) AS r_added,
         |       CAST(COALESCE(w.weight, 0) AS BIGINT) AS weight
         |FROM cl LEFT JOIN w ON cl.pos = w.pos""".stripMargin,
    // mini-batch Lloyd replayed: state = list of (cid, c, n) structs;
    // each level filters the same 20-bit md5 batch slice, blends the
    // batch per-cluster sums into the accumulated mass with the same
    // c·n+Σ / n+m formula, and 6dp-quantizes — missed clusters pass
    // through unchanged (the LEFT JOIN null arm)
    "kmeans_minibatch" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), seed AS (
         |  SELECT list(struct_pack(cid := cid, c := c, n := CAST(0 AS BIGINT))
         |              ORDER BY cid) AS state
         |  FROM (
         |    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
         |             AS cid,
         |           CAST(embedding AS DOUBLE[]) AS c
         |    FROM (SELECT vec_id, embedding FROM embeddings
         |          ORDER BY vec_id LIMIT $K))
         |), iter AS (
         |  SELECT 0 AS r, (SELECT state FROM seed) AS state
         |  UNION ALL
         |  SELECT s.r + 1, nxt.state
         |  FROM iter s, LATERAL (
         |    WITH batch AS (
         |      SELECT vec_id, v FROM e
         |      WHERE CAST(concat('0x', substr(md5(concat('mb:',
         |              CAST(s.r + 1 AS VARCHAR), ':',
         |              CAST(vec_id AS VARCHAR))), 1, 5)) AS BIGINT)
         |            % $MbMod = 0
         |    ), asg AS (
         |      SELECT b.vec_id, b.v,
         |        (SELECT u.cid FROM (SELECT unnest(s.state) AS u)
         |         ORDER BY list_distance(b.v, u.c), u.cid LIMIT 1) AS cl
         |      FROM batch b
         |    ), agg AS (
         |      SELECT cl, dim, sum(v[dim]) AS sd, count(*) AS m
         |      FROM asg CROSS JOIN generate_series(1, $DIM) g(dim)
         |      GROUP BY cl, dim
         |    ), base AS (
         |      SELECT u.cid AS cid, u.c AS c, u.n AS n, g.dim AS dim
         |      FROM (SELECT unnest(s.state) AS u),
         |           generate_series(1, $DIM) g(dim)
         |    ), nd AS (
         |      SELECT base.cid, base.dim, base.n, COALESCE(a.m, 0) AS m,
         |        CASE WHEN a.m IS NULL THEN base.c[base.dim]
         |             ELSE round((base.c[base.dim] * base.n + a.sd)
         |                        / (base.n + a.m), 6) END AS cv
         |      FROM base LEFT JOIN agg a
         |        ON a.cl = base.cid AND a.dim = base.dim
         |    )
         |    SELECT list(struct_pack(cid := cid, c := c, n := nn)
         |                ORDER BY cid) AS state
         |    FROM (
         |      SELECT cid, list(cv ORDER BY dim) AS c,
         |             CAST(max(n) + max(m) AS BIGINT) AS nn
         |      FROM nd GROUP BY cid)
         |  ) nxt
         |  WHERE s.r < $MbRounds
         |)
         |SELECT u.cid AS cluster, CAST(g.dim AS INT) AS dim,
         |       u.c[g.dim] AS value, u.n AS n_seen
         |FROM (SELECT state FROM iter ORDER BY r DESC LIMIT 1) f,
         |     (SELECT unnest(f.state) AS u) s2,
         |     generate_series(1, $DIM) g(dim)""".stripMargin,
    // replays runReplayable's seeded Lloyd recursion exactly: seed set
    // by the same id-hash order, per level a correlated argmin
    // assignment + 6dp-rounded group means carried as a list-of-structs
    // state row, stopping on Σ‖Δc‖ < eps or the maxIter−1 update bound.
    // State rows recurse only while s.err ≥ eps, so the final (max r)
    // row is the run's result whether it converged or hit the bound.
    // the whole divisive tree unrolled: per split, the target-cluster
    // election, the id-hash seed pair, BisectRounds assign/update
    // rounds (6dp-quantized means, empty child keeps its centroid via
    // coalesce), the final child assignment, and the label rewrite —
    // then final per-cluster means. Every branch of the engine loop
    // has a CTE twin, so a wrong split target, a swapped child, or a
    // missed quantization shows as a value mismatch.
    "kmeans_bisecting" -> {
      val splits = (1 until BisectK).map { s =>
        val rounds = (1 to BisectRounds).map { r =>
          s"""a${s}r$r AS MATERIALIZED (
             |  SELECT vec_id, v,
             |    CASE WHEN list_distance(v, (SELECT c0 FROM c${s}r${r - 1}))
             |           <= list_distance(v, (SELECT c1 FROM c${s}r${r - 1}))
             |         THEN 0 ELSE 1 END AS ch
             |  FROM sub$s
             |), c${s}r$r AS MATERIALIZED (
             |  SELECT
             |    coalesce((SELECT list(round(m, 6) ORDER BY dim) FROM (
             |       SELECT g.dim AS dim, sum(v[g.dim]) / count(*) AS m
             |       FROM a${s}r$r, generate_series(1, $DIM) g(dim)
             |       WHERE ch = 0 GROUP BY g.dim)),
             |      (SELECT c0 FROM c${s}r${r - 1})) AS c0,
             |    coalesce((SELECT list(round(m, 6) ORDER BY dim) FROM (
             |       SELECT g.dim AS dim, sum(v[g.dim]) / count(*) AS m
             |       FROM a${s}r$r, generate_series(1, $DIM) g(dim)
             |       WHERE ch = 1 GROUP BY g.dim)),
             |      (SELECT c1 FROM c${s}r${r - 1})) AS c1
             |)""".stripMargin
        }.mkString(", ")
        s"""tgt$s AS MATERIALIZED (
           |  SELECT lab FROM l${s - 1} GROUP BY lab
           |  ORDER BY count(*) DESC, lab LIMIT 1
           |), sub$s AS MATERIALIZED (
           |  SELECT vec_id, v FROM l${s - 1}
           |  WHERE lab = (SELECT lab FROM tgt$s)
           |), c${s}r0 AS MATERIALIZED (
           |  SELECT cs[1] AS c0, cs[2] AS c1 FROM (
           |    SELECT list(v ORDER BY h, vec_id) AS cs FROM (
           |      SELECT v,
           |        (vec_id * 2654435761 + 42 * 40503) % 2147483647 AS h,
           |        vec_id
           |      FROM sub$s ORDER BY h, vec_id LIMIT 2))
           |), $rounds, fin$s AS MATERIALIZED (
           |  SELECT vec_id,
           |    CASE WHEN
           |        list_distance(v, (SELECT c0 FROM c${s}r$BisectRounds))
           |        <= list_distance(v, (SELECT c1 FROM c${s}r$BisectRounds))
           |      THEN 0 ELSE 1 END AS ch
           |  FROM sub$s
           |), l$s AS MATERIALIZED (
           |  SELECT l.vec_id, l.v,
           |    CASE WHEN f.ch = 1 THEN $s ELSE l.lab END AS lab
           |  FROM l${s - 1} l LEFT JOIN fin$s f ON l.vec_id = f.vec_id
           |)""".stripMargin
      }.mkString(", ")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), l0 AS MATERIALIZED (SELECT vec_id, v, 0 AS lab FROM e),
         |$splits
         |SELECT lab AS cluster, CAST(g.dim AS INT) AS dim,
         |  round(sum(v[g.dim]) / count(*), 6) AS value,
         |  count(*) AS n
         |FROM l${BisectK - 1}, generate_series(1, $DIM) g(dim)
         |GROUP BY lab, g.dim""".stripMargin
    },
    "kmeans_full" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), seeds AS (
         |  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
         |  FROM (
         |    SELECT CAST(row_number() OVER (
         |             ORDER BY (vec_id * 2654435761 + 42 * 40503) % 2147483647,
         |                      vec_id) - 1 AS INT) AS cid, v AS c
         |    FROM e
         |    ORDER BY (vec_id * 2654435761 + 42 * 40503) % 2147483647, vec_id
         |    LIMIT $K
         |  )
         |), iter AS (
         |  SELECT 0 AS r, (SELECT cents FROM seeds) AS cents, 1e308 AS err
         |  UNION ALL
         |  SELECT s.r + 1, nxt.cents, nxt.err
         |  FROM iter s, LATERAL (
         |    WITH asg AS (
         |      SELECT e.vec_id, e.v,
         |        (SELECT u.cid FROM (SELECT unnest(s.cents) AS u)
         |         ORDER BY list_distance(e.v, u.c), u.cid LIMIT 1) AS cl
         |      FROM e
         |    ), mean_dims AS (
         |      SELECT cl, dim, round(sum(v[dim]) / count(*), 6) AS m
         |      FROM asg CROSS JOIN generate_series(1, $DIM) g(dim)
         |      GROUP BY cl, dim
         |    ), newc AS (
         |      SELECT cl AS cid, list(m ORDER BY dim) AS c
         |      FROM mean_dims GROUP BY cl
         |    )
         |    SELECT
         |      (SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid)
         |       FROM newc) AS cents,
         |      (SELECT sum(list_distance(n.c, u.c))
         |       FROM newc n JOIN (SELECT unnest(s.cents) AS u) t
         |         ON n.cid = u.cid) AS err
         |  ) nxt
         |  WHERE s.err >= 0.01 AND s.r < 19
         |)
         |SELECT u.cid AS cluster, CAST(g.dim AS INT) AS dim,
         |       u.c[g.dim] AS value
         |FROM (SELECT r, cents FROM iter ORDER BY r DESC LIMIT 1) f,
         |     (SELECT unnest(f.cents) AS u) s2,
         |     generate_series(1, $DIM) g(dim)""".stripMargin)
}
