package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** I/O parity with the reference's text formats (FIXTURES.md §A).
  *
  * Input: one point per line, `<x1, x2, …, xd>` — parser semantics of
  * `KMeans.parsePoint` (/root/reference/kmeans/.../KMeans.java:261-274):
  * strip angle brackets, split on comma+whitespace, parse as double.
  * Pure built-in string expressions — the parse stays inside codegen and
  * Catalyst prunes it away when only some columns are read.
  *
  * Output: `clusterId TAB <c1, c2, …>` — the reference's reducer output
  * (KMeans.java:90,150). We do NOT reproduce the reference driver's
  * `substring(0,1)` id re-parse (KMeans.java:232), which silently breaks
  * k > 10 — documented quirk, not semantics.
  */
object PointsIO {

  /** Read a reference-format points file → DataFrame[point: array<double>]
    * through the first-class DSv2 source (graft.sources.PointsDataSource):
    * line-aligned byte-range splits, pruning-aware reader. Malformed
    * lines are fatal (parseDouble), matching the reference's
    * NumberFormatException behavior (KMeans.java:269). */
  def readPoints(spark: SparkSession, path: String): DataFrame =
    spark.read.format("points").load(path)

  /** The pre-DSv2 built-in-expression parse of the same format (kept:
    * it is the pattern for ad-hoc text formats without a connector). */
  def readPointsText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        split(regexp_replace(col("value"), "[<>]", ""), ",\\s*")
          .cast("array<double>").as("point"))

  /** Format an array<double> column back to `<x1, x2, …>`. */
  def formatPoint(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("<"),
      array_join(transform(vec, x => x.cast("string")), ", "),
      lit(">"))

  /** Write (cluster, centroid) rows as the reference's `id\t<coords>`
    * text lines. */
  def writeCentroids(df: DataFrame, clusterCol: String, vecCol: String,
                     path: String): Unit =
    df.select(concat_ws("\t",
        col(clusterCol).cast("string"),
        formatPoint(col(vecCol))).as("value"))
      .write.mode("overwrite").text(path)

  /** Read centroids written by [[writeCentroids]] (or by the reference's
    * reducer) back into (cluster, centroid) rows — full-width id parse,
    * no k≤10 limit. */
  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        split(col("value"), "\t").getItem(0).cast("int").as("cluster"),
        split(regexp_replace(split(col("value"), "\t").getItem(1), "[<>]", ""),
          ",\\s*").cast("array<double>").as("centroid"))
}
