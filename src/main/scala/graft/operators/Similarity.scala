package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.VectorFunctions._
import graft.kmeans.KMeansOps

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths per the training-pipeline mandate:
  *  - `ann_topk_cosine`: brute-force cosine top-k — the correctness
  *    baseline. The (small) query set is broadcast; the scan side
  *    streams once; per-query top-k via window rank. At scale this is
  *    one pass over the data per query batch, no shuffle of the corpus.
  *  - `ann_ivf`: IVF-style pruned search — the k-means centroids (the
  *    engine's own clustering kernel) act as the coarse quantizer; each
  *    query probes only its `NProbe` nearest cells, cutting the scanned
  *    fraction to ~NProbe/k while returning near-identical neighbors.
  *
  * Ranking ties are broken on (rounded score desc, vec_id) so Spark and
  * the DuckDB oracle rank identically despite float-summation order.
  */
object Similarity {

  val NQueries = 10
  val TopK = 10
  val NProbe = 2

  private def emb(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      // norm computed once per corpus vector, before any join fan-out
      .withColumn("nrm", l2Norm(col("v")))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))

  private def cosineScore: Column =
    round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)

  private def rankTopK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Brute-force cosine top-k: exact baseline. */
  def annTopKCosine(spark: SparkSession, dir: String): DataFrame = {
    val scored = emb(spark, dir)
      .join(broadcast(queriesDf(spark, dir)),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineScore.as("score"))
    rankTopK(scored)
  }

  /** Nearest `n` cell ids for one vector — driver-side reference
    * implementation (same argmin + lowest-index tie-break as the
    * distributed path; OperatorsSpec asserts agreement). */
  def probeCells(cents: Array[Array[Double]], v: Array[Double],
                 n: Int): Seq[Int] =
    cents.iterator.zipWithIndex.map { case (c, i) =>
      val d = c.iterator.zip(v.iterator)
        .map { case (x, y) => (x - y) * (x - y) }.sum
      (d, i)
    }.toSeq.sortBy(identity).take(n).map(_._2)

  /** The `n` nearest cell ids as a COLUMN: per-cell squared distances
    * zip with their indices, struct-sort (distance asc, cid asc — the
    * strict-< tie-break), slice n. Runs inside codegen on the query
    * rows, so routing scales with the query batch distributively — no
    * driver collect. */
  def probeCellsCol(vec: Column, cents: Array[Array[Double]],
                    n: Int): Column = {
    val ds = KMeansOps.distancesDyn(vec, cents)
    transform(
      slice(array_sort(zip_with(ds,
        sequence(lit(0), lit(cents.length - 1)),
        (d, i) => struct(d.as("d"), i.as("cid")))), 1, n),
      s => s.getField("cid"))
  }

  /** IVF-pruned cosine top-k: probe the NProbe nearest k-means cells.
    * Routing is in-plan ([[probeCellsCol]] on the query DF) and the
    * probe list EXPLODES to (query, cell) rows joined on
    * `cell = cluster` — an equi key, so the corpus side hash-joins (or
    * broadcasts, as here, while the query batch is small) instead of
    * evaluating an array_contains nested-loop predicate per
    * (corpus × query) pair. Probed cells are distinct per query ⇒ no
    * duplicate scoring. */
  def annIvfCosine(spark: SparkSession, dir: String): DataFrame = {
    val cents = KMeansQueries.fixedCentroids(spark, dir)
    val assigned = KMeansOps.assignDyn(emb(spark, dir), "v", cents)
    val probed = queriesDf(spark, dir)
      .withColumn("probe_cell",
        explode(probeCellsCol(col("qv"), cents, NProbe)))
    val scored = assigned
      .join(broadcast(probed),
        col("probe_cell") === col("cluster") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineScore.as("score"))
    rankTopK(scored)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_cosine" -> annTopKCosine,
    "ann_ivf" -> annIvfCosine)

  private def centsCte =
    s"""cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
       |         CAST(embedding AS DOUBLE[]) AS c
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY vec_id LIMIT ${KMeansQueries.K})
       |), q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $NQueries
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_topk_cosine" ->
      s"""SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6)
         |      AS score,
         |    row_number() OVER (
         |      PARTITION BY q.query_id
         |      ORDER BY round(list_cosine_similarity(q.qv,
         |                CAST(e.embedding AS DOUBLE[])), 6) DESC, e.vec_id) AS rank
         |  FROM embeddings e CROSS JOIN
         |    (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |     FROM embeddings WHERE vec_id < $NQueries) q
         |  WHERE e.vec_id <> q.query_id)
         |WHERE rank <= $TopK""".stripMargin,
    "ann_ivf" ->
      s"""WITH $centsCte, assigned AS (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
         |         (SELECT c.cid FROM cents c
         |          ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.c), c.cid
         |          LIMIT 1) AS cluster
         |  FROM embeddings e
         |), probed AS (
         |  SELECT query_id, qv,
         |         (SELECT list(cid) FROM (
         |            SELECT cid FROM cents c
         |            ORDER BY list_distance(q.qv, c.c), c.cid
         |            LIMIT $NProbe)) AS probe
         |  FROM q
         |)
         |SELECT query_id, neighbor_id, rank, score FROM (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(p.qv, a.v), 6) AS score,
         |    row_number() OVER (
         |      PARTITION BY p.query_id
         |      ORDER BY round(list_cosine_similarity(p.qv, a.v), 6) DESC,
         |               a.vec_id) AS rank
         |  FROM assigned a JOIN probed p
         |    ON list_contains(p.probe, a.cluster) AND a.vec_id <> p.query_id)
         |WHERE rank <= $TopK""".stripMargin)
}
