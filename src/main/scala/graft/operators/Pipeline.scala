package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** End-to-end training-data curation pipeline — the composition the
  * individual operators exist for:
  *
  *   documents → quality gate → language gate → exact dedup (keep lowest
  *   doc_id per content hash) → per-source survivor stats
  *
  * One narrow pass computes both gates (no shuffle), the dedup is one
  * hash aggregation, the report one more — three stages total at any
  * scale, with the gates fused into the scan-side of the dedup shuffle
  * (filters run before data moves).
  */
object Pipeline {

  val MinTokens = 20
  val MaxStopRatio = 0.3

  /** Survivor counts and volume per source after the full gate+dedup
    * chain. */
  def pipelineFilter(spark: SparkSession, dir: String): DataFrame = {
    val gated = t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio",
        size(filter(col("toks"),
          x => x.isInCollection(TextAnalysis.Stopwords))).cast("double") /
          col("n_tokens"))
      .where(col("n_tokens") >= MinTokens &&
        col("stop_ratio") <= MaxStopRatio && col("lang") === "en")
    val deduped = gated
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    // avg as ONE double division of two exact integers — `avg(int)` sums
    // doubles in partition order (last-ulp nondeterminism vs DuckDB's
    // exact average, which flipped a round(…,6) boundary in r1).
    gated.join(deduped, gated("doc_id") === deduped("keep_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_tokens")).cast("double") / count(lit(1)))
          .as("avg_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_filter" -> pipelineFilter)

  private val stopList =
    TextAnalysis.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "pipeline_filter" ->
      s"""WITH gated AS (
         |  SELECT doc_id, text, source, n_chars,
         |         len(string_split(text, ' ')) AS n_tokens
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= $MinTokens
         |    AND CAST(len(list_filter(string_split(text, ' '),
         |              x -> list_contains($stopList, x))) AS DOUBLE)
         |        / len(string_split(text, ' ')) <= $MaxStopRatio
         |    AND lang = 'en'
         |), deduped AS (
         |  SELECT min(doc_id) AS keep_id FROM gated GROUP BY md5(text)
         |)
         |-- sum(int) must be cast: DuckDB returns HUGEINT, which the
         |-- driver's pandas bridge renders as float64 ("42.0" vs "42").
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
         |FROM gated JOIN deduped ON doc_id = keep_id
         |GROUP BY source""".stripMargin)
}
