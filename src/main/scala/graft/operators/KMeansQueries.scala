package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "km_assign" -> kmAssign,
    "km_sizes" -> kmSizes,
    "km_update" -> kmUpdate,
    "km_shift" -> kmShift,
    "km_cost" -> kmCost,
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
    // replays runReplayable's seeded Lloyd recursion exactly: seed set
    // by the same id-hash order, per level a correlated argmin
    // assignment + 6dp-rounded group means carried as a list-of-structs
    // state row, stopping on Σ‖Δc‖ < eps or the maxIter−1 update bound.
    // State rows recurse only while s.err ≥ eps, so the final (max r)
    // row is the run's result whether it converged or hit the bound.
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
