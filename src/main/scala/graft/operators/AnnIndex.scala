package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.VectorFunctions._
import graft.kmeans.KMeansOps
import graft.sources.ParquetSink

/** PERSISTED IVF-PQ index — the build-once / query-many shape real
  * 100 TB vector search runs on, closing the gap where every `ann_*`
  * query re-derived centroids + codebook and re-encoded the corpus
  * per run ([[Similarity]] keeps those as the self-contained variants).
  *
  * Build ([[annIndexBuild]]) writes three artifacts under a
  * deterministic per-corpus path:
  *  - `codes/` — one row per corpus vector: (vec_id, code_0..7,
  *    packed), HIVE-PARTITIONED BY COARSE CELL via
  *    [[ParquetSink.writePartitioned]] and sorted by vec_id within
  *    each cell, so a probe-pruned search reads ONLY the probed cell
  *    directories (partition pruning) at 4 packed bytes per vector —
  *    the corpus's raw embeddings are never touched again;
  *  - `cents/` — the k coarse centroids (k rows);
  *  - `codebook/` — the PQ sub-codebooks (PqM·PqKsub rows).
  *
  * Search ([[annIndexSearch]]) answers the standard query batch by
  * SCANNING the index: centroids + codebook load from their k-row
  * artifacts (driver-side, same O(k·d) weight as the k-means loop's
  * collects), the query batch probes its cells, and the codes scan is
  * statically pruned to the probed cells before ADC scoring. The
  * result is bit-identical to [[Similarity.annIvfPq]] — same oracle.
  *
  * Artifact root: `spark.graft.artifacts.dir` (a shared filesystem
  * path on a real cluster — HDFS/S3); defaults to the JVM tmpdir,
  * which is correct only in local mode. The path is keyed by data dir
  * AND corpus row count, so a regenerated corpus self-invalidates.
  */
object AnnIndex {

  import Similarity.{NProbe, PqKsub, PqM, TopK}

  def indexPath(spark: SparkSession, dir: String): String = {
    val n = t(spark, dir, "embeddings").count()
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    // v2: codes carry the label metadata column (filtered search);
    // the version bump keeps a stale label-less artifact from being
    // reused by the build-once gate
    s"${graft.sources.Artifacts.root(spark)}/ivfpq2_${key}_n$n"
  }

  /** Assignment + PQ encode of one (vec_id, v) corpus against a given
    * centroid set and codebook — narrow projections over the scan,
    * shared by the base build and the frozen-codebook delta append. */
  private def encode(corpus: DataFrame, cents: Array[Array[Double]],
                     cb: Array[Array[Array[Double]]]): DataFrame =
    Similarity.withBlockDists(
      KMeansOps.assignDyn(corpus, "v", cents), "v", cb, "ds_")
      .select(col("vec_id") +: col("label") +: col("cluster") +:
        (0 until PqM).map(m =>
          (array_position(col(s"ds_$m"), array_min(col(s"ds_$m"))) - 1)
            .cast("int").as(s"code_$m")): _*)
      .withColumn("packed",
        (0 until PqM).map(m => col(s"code_$m").cast("long") *
          (1L << (4 * m))).reduce(_ + _))

  /** Write the full index (codes + cents + codebook); returns its path.
    * The codes write is the one corpus-sized job: assignment + PQ
    * encode are narrow projections over the scan, then ONE shuffle
    * routes rows to their cell directory (one file per cell). */
  def buildIndex(spark: SparkSession, dir: String): String = {
    val path = indexPath(spark, dir)
    val cents = KMeansQueries.fixedCentroids(spark, dir)
    val cb = Similarity.pqCodebook(spark, dir)
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"),
        col("label"))
    val encoded = encode(emb, cents, cb)
    ParquetSink.writePartitioned(encoded, s"$path/codes",
      partitionCols = Seq("cluster"), sortCols = Seq("vec_id"))
    val spark2 = spark
    import spark2.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cents")
    (for { m <- 0 until PqM; j <- 0 until PqKsub } yield (m, j, cb(m)(j).toSeq))
      .toDF("m", "j", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    path
  }

  /** Build-once gate: reuse the artifact when its committed codes dir
    * exists, else build. (The path embeds the corpus row count, so a
    * changed corpus never reuses a stale index.) */
  def ensureIndex(spark: SparkSession, dir: String): String = {
    val path = indexPath(spark, dir)
    val success = new org.apache.hadoop.fs.Path(s"$path/codes/_SUCCESS")
    val fs = success.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(success)) path else buildIndex(spark, dir)
  }

  /** Build the index, then report per-cell invariants READ BACK FROM
    * THE ARTIFACT — cell population, vec_id range, and the sum of
    * packed code words (a fingerprint of every code nibble in the
    * cell). The DuckDB oracle recomputes all of it from the raw
    * embeddings, so a corrupted write, a mis-routed row, or a codec
    * drift between build and artifact all surface as value
    * mismatches. */
  def annIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val path = buildIndex(spark, dir)
    spark.read.parquet(s"$path/codes")
      .groupBy(col("cluster").cast("int").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"),
        sum(col("packed")).as("sum_packed"))
  }

  /** Read the persisted k-row centroid artifact back as the in-plan
    * array form. */
  private def readCents(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/cents")
      .orderBy(col("cid")).collect().map(_.getSeq[Double](1).toArray)

  /** Read the persisted PQ codebook artifact back as [m][j][dim]. */
  private def readCodebook(spark: SparkSession,
                           path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
      .toMap
    Array.tabulate(PqM, PqKsub)((m, j) => rows((m, j)))
  }

  /** Deterministic "newly arrived" vectors for the append path: each
    * base vector re-enters REVERSED with vec_id offset by the corpus
    * size — disjoint ids, different geometry, closed-form for the
    * oracle (list_reverse + count offset). */
  private def deltaCorpus(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    emb.crossJoin(broadcast(emb.agg(count(lit(1)).as("n_base"))))
      .select((col("vec_id") + col("n_base")).as("vec_id"),
        reverse(toDoubleVec(col("embedding"))).as("v"), col("label"))
  }

  /** Encode the delta corpus with the artifact's frozen quantizers and
    * write it as the `codes_delta` segment (overwrite-idempotent);
    * shared by the append report and the compaction. Returns the index
    * path. */
  private def ensureDelta(spark: SparkSession, dir: String): String = {
    val path = ensureIndex(spark, dir)
    val cents = readCents(spark, path)
    val cb = readCodebook(spark, path)
    val encoded = encode(deltaCorpus(spark, dir), cents, cb)
    ParquetSink.writePartitioned(encoded, s"$path/codes_delta",
      partitionCols = Seq("cluster"), sortCols = Seq("vec_id"))
    path
  }

  /** INCREMENTAL append — the segment model (Lucene/FAISS shape) that
    * makes a 100 TB index maintainable: new vectors are encoded with
    * the FROZEN centroids + codebook READ FROM THE ARTIFACT (real
    * systems never re-derive the quantizers on ingest — that would
    * silently re-key every existing cell) and written as a SEPARATE
    * `codes_delta` segment, overwrite-idempotent, leaving the base
    * segment untouched. Search/compaction reads the segment union.
    * The query reports per-(segment, cell) invariants over the merged
    * index read back from disk; the oracle re-derives both segments
    * from raw embeddings — base as ann_index_build, delta over the
    * reversed+offset corpus with the SAME base-derived quantizers. */
  def annIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureDelta(spark, dir)
    spark.read.parquet(s"$path/codes").withColumn("segment", lit("base"))
      .unionByName(spark.read.parquet(s"$path/codes_delta")
        .withColumn("segment", lit("delta")))
      .groupBy(col("segment"), col("cluster").cast("int").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"),
        sum(col("packed")).as("sum_packed"))
  }

  /** SEGMENT COMPACTION — the third phase of the index lifecycle
    * (build → append → compact): fold the delta segment back into one
    * canonical segment so searches stop paying the per-segment scan
    * union and small-files tax. Codes are NOT re-derived — compaction
    * is a pure RE-LAYOUT of already-encoded rows (the quantizers are
    * frozen, so re-encoding would be wasted work and a silent
    * correctness hazard): read the segment union, ONE shuffle routes
    * rows back to their cell directory, sorted by vec_id within each
    * cell — restoring exactly the layout/pruning properties of a fresh
    * build at delta-plus-base scan cost, never touching raw
    * embeddings. The report reads the COMPACTED artifact back and
    * emits the same per-cell invariants as `ann_index_build`; the
    * oracle re-derives base+delta codes from raw embeddings and
    * aggregates them as one segment, so a row lost, duplicated or
    * mis-routed by the rewrite surfaces as a value mismatch. */
  def annIndexCompact(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureDelta(spark, dir)
    val merged = spark.read.parquet(s"$path/codes")
      .unionByName(spark.read.parquet(s"$path/codes_delta"))
    ParquetSink.writePartitioned(merged, s"$path/codes_compacted",
      partitionCols = Seq("cluster"), sortCols = Seq("vec_id"))
    spark.read.parquet(s"$path/codes_compacted")
      .groupBy(col("cluster").cast("int").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"),
        sum(col("packed")).as("sum_packed"))
  }

  /** IVF-PQ search over the PERSISTED index: the corpus side of the
    * plan reads `codes/` only — statically pruned to the probed cells
    * (the probe set is derived driver-side from the tiny query batch,
    * so the cell filter is a literal `IN` the scan's partition
    * discovery prunes on), then ADC-scored from broadcast per-query
    * lookup tables and cut through the native top-k heaps. Result ==
    * [[Similarity.annIvfPq]] (same oracle) with the per-run
    * centroid/codebook derivation and corpus re-encode replaced by
    * three artifact reads. */
  def annIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIndex(spark, dir)
    val cents = readCents(spark, path)
    val cb = readCodebook(spark, path)
    val qs = Similarity.queriesDf(spark, dir)
      .select(col("query_id"), col("qv"))
    // static partition filter: probed cells of the (tiny) query batch,
    // computed driver-side with the same argmin/tie-break as the
    // in-plan routing (OperatorsSpec asserts the two agree)
    val probedAll = qs.collect()
      .flatMap(r => Similarity.probeCells(cents,
        r.getSeq[Double](1).toArray, NProbe))
      .distinct.sorted
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("cluster").isin(probedAll.map(Int.box): _*))
    val probedLuts = Similarity.withBlockDists(qs, "qv", cb, "lut_")
      .withColumn("probe_cell",
        explode(Similarity.probeCellsCol(col("qv"), cents, NProbe)))
    val scored = codes
      .join(broadcast(probedLuts),
        col("probe_cell") === col("cluster") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(sqrt((0 until PqM).map(m =>
          element_at(col(s"lut_$m"), col(s"code_$m") + 1)).reduce(_ + _)), 6)
          .as("adc_dist"))
    val cut = graft.plans.TopKPerKey.topKPerKey(scored,
      Seq("query_id"), Seq("adc_dist" -> true, "neighbor_id" -> true), TopK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    cut.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adc_dist"))
  }

  /** FILTERED search over the persisted index — the vector-DB
    * composition of [[annIndexSearch]] (scan the artifact, never raw
    * embeddings) and [[Similarity.annFiltered]]'s correctness rule
    * (the metadata predicate is a JOIN condition applied BEFORE
    * ranking — post-filtering an unfiltered top-k under-returns):
    * the index stores the label ALONGSIDE the codes (this is why
    * vector stores keep filterable metadata in the segment, not in a
    * side table — the filter must not re-join raw data), so the plan
    * reads probed cells, keeps label-matched rows, ADC-scores only
    * those, and heap-cuts per query. */
  def annIndexSearchFiltered(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIndex(spark, dir)
    val cents = readCents(spark, path)
    val cb = readCodebook(spark, path)
    val qs = Similarity.queriesDf(spark, dir)
      .select(col("query_id"), col("qv"))
      .join(t(spark, dir, "embeddings")
          .select(col("vec_id"), col("label").as("q_label")),
        col("query_id") === col("vec_id"))
      .select(col("query_id"), col("qv"), col("q_label"))
    val probedAll = qs.collect()
      .flatMap(r => Similarity.probeCells(cents,
        r.getSeq[Double](1).toArray, NProbe))
      .distinct.sorted
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("cluster").isin(probedAll.map(Int.box): _*))
    val probedLuts = Similarity.withBlockDists(qs, "qv", cb, "lut_")
      .withColumn("probe_cell",
        explode(Similarity.probeCellsCol(col("qv"), cents, NProbe)))
    val scored = codes
      .join(broadcast(probedLuts),
        col("probe_cell") === col("cluster") &&
          col("vec_id") =!= col("query_id") &&
          col("label") === col("q_label"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label"),
        round(sqrt((0 until PqM).map(m =>
          element_at(col(s"lut_$m"), col(s"code_$m") + 1)).reduce(_ + _)), 6)
          .as("adc_dist"))
    val cut = graft.plans.TopKPerKey.topKPerKey(scored,
      Seq("query_id"), Seq("adc_dist" -> true, "neighbor_id" -> true), TopK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    cut.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("label"), col("adc_dist"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_index_search_filtered" -> annIndexSearchFiltered,
    "ann_index_build" -> annIndexBuild,
    "ann_index_append" -> annIndexAppend,
    "ann_index_compact" -> annIndexCompact,
    "ann_index_search" -> annIndexSearch)

  val oracles: Map[String, String] = Map(
    // recompute the per-cell invariants from the raw embeddings via the
    // same assignment + PQ-encode SQL the ann_* oracles share
    "ann_index_build" -> {
      val packed = (0 until PqM)
        .map(m => s"CAST(code_$m AS BIGINT) * ${1L << (4 * m)}")
        .mkString(" + ")
      s"""WITH ${Similarity.centsCte}, ${Similarity.pqCodesCte}, codes2 AS (
         |  SELECT cd.*,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM codes cd JOIN ev e USING (vec_id)
         |)
         |SELECT CAST(cluster AS INT) AS cluster, count(*) AS n_vectors,
         |       min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id,
         |       CAST(sum($packed) AS BIGINT) AS sum_packed
         |FROM codes2 GROUP BY cluster""".stripMargin
    },
    // the delta segment re-derived from raw embeddings: reversed+offset
    // vectors, encoded against the SAME base-derived quantizers
    "ann_index_append" -> {
      val packed = (0 until PqM)
        .map(m => s"CAST(code_$m AS BIGINT) * ${1L << (4 * m)}")
        .mkString(" + ")
      val codeColsD = (0 until PqM).map(m =>
        s"""    (SELECT s.j FROM seeds s
           |     ORDER BY ${Similarity.sqdSql("e.v", "s.c", m)}, s.j LIMIT 1)
           |      AS code_$m""".stripMargin)
        .mkString(",\n")
      s"""WITH ${Similarity.centsCte}, ${Similarity.pqCodesCte}, codes2 AS (
         |  SELECT cd.*,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM codes cd JOIN ev e USING (vec_id)
         |), ev_d AS (
         |  SELECT vec_id + (SELECT count(*) FROM embeddings) AS vec_id,
         |         list_reverse(CAST(embedding AS DOUBLE[])) AS v
         |  FROM embeddings
         |), codes_d AS (
         |  SELECT e.vec_id,
         |$codeColsD,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM ev_d e
         |)
         |SELECT 'base' AS segment, CAST(cluster AS INT) AS cluster,
         |       count(*) AS n_vectors, min(vec_id) AS min_vec_id,
         |       max(vec_id) AS max_vec_id,
         |       CAST(sum($packed) AS BIGINT) AS sum_packed
         |FROM codes2 GROUP BY cluster
         |UNION ALL
         |SELECT 'delta' AS segment, CAST(cluster AS INT) AS cluster,
         |       count(*) AS n_vectors, min(vec_id) AS min_vec_id,
         |       max(vec_id) AS max_vec_id,
         |       CAST(sum($packed) AS BIGINT) AS sum_packed
         |FROM codes_d GROUP BY cluster""".stripMargin
    },
    // the compacted artifact == base ∪ delta re-derived from raw
    // embeddings, aggregated as ONE segment (same CTEs as the append
    // oracle, minus the segment discriminator)
    "ann_index_compact" -> {
      val packed = (0 until PqM)
        .map(m => s"CAST(code_$m AS BIGINT) * ${1L << (4 * m)}")
        .mkString(" + ")
      val codeColsD = (0 until PqM).map(m =>
        s"""    (SELECT s.j FROM seeds s
           |     ORDER BY ${Similarity.sqdSql("e.v", "s.c", m)}, s.j LIMIT 1)
           |      AS code_$m""".stripMargin)
        .mkString(",\n")
      s"""WITH ${Similarity.centsCte}, ${Similarity.pqCodesCte}, codes2 AS (
         |  SELECT cd.*,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM codes cd JOIN ev e USING (vec_id)
         |), ev_d AS (
         |  SELECT vec_id + (SELECT count(*) FROM embeddings) AS vec_id,
         |         list_reverse(CAST(embedding AS DOUBLE[])) AS v
         |  FROM embeddings
         |), codes_d AS (
         |  SELECT e.vec_id,
         |$codeColsD,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM ev_d e
         |), merged AS (
         |  SELECT vec_id, cluster, $packed AS pk FROM codes2
         |  UNION ALL
         |  SELECT vec_id, cluster, $packed AS pk FROM codes_d
         |)
         |SELECT CAST(cluster AS INT) AS cluster, count(*) AS n_vectors,
         |       min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id,
         |       CAST(sum(pk) AS BIGINT) AS sum_packed
         |FROM merged GROUP BY cluster""".stripMargin
    },
    // search over the persisted index answers exactly like ann_ivfpq
    "ann_index_search" -> Similarity.oracles("ann_ivfpq"),
    // ann_ivfpq's replay with the label equality as a PRE-RANKING join
    // predicate (the annFiltered rule)
    "ann_index_search_filtered" -> {
      val adc = "sqrt(" + (0 until PqM).map(m =>
        s"(SELECT ${Similarity.sqdSql("p.qv", "s.c", m)} FROM seeds s WHERE s.j = c2.code_$m)")
        .mkString(" + ") + ")"
      s"""WITH ${Similarity.centsCte}, ${Similarity.pqCodesCte}, codes2 AS (
         |  SELECT cd.*, emb.label,
         |    (SELECT c.cid FROM cents c
         |     ORDER BY list_distance(e.v, c.c), c.cid LIMIT 1) AS cluster
         |  FROM codes cd JOIN ev e USING (vec_id)
         |       JOIN embeddings emb USING (vec_id)
         |), probed AS (
         |  SELECT q.query_id, q.qv, emb.label AS q_label,
         |         (SELECT list(cid) FROM (
         |            SELECT cid FROM cents c
         |            ORDER BY list_distance(q.qv, c.c), c.cid
         |            LIMIT ${Similarity.NProbe})) AS probe
         |  FROM q JOIN embeddings emb ON q.query_id = emb.vec_id
         |)
         |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
         |       label, adc_dist
         |FROM (
         |  SELECT p.query_id, c2.vec_id AS neighbor_id, c2.label,
         |    round($adc, 6) AS adc_dist,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY round($adc, 6), c2.vec_id) AS rank
         |  FROM codes2 c2 JOIN probed p
         |    ON list_contains(p.probe, c2.cluster)
         |   AND c2.vec_id <> p.query_id
         |   AND c2.label = p.q_label)
         |WHERE rank <= ${Similarity.TopK}""".stripMargin
    })
}
