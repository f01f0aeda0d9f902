package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata (TESTDATA.md).
  * Plain `spark.read.parquet` — filters/projections in the queries reach
  * the scan via Catalyst pushdown (verify with `.explain("formatted")`:
  * PushedFilters / ReadSchema). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Corpus row count memoized per (application, dir, table) — the
    * key the build-once ANN artifacts self-invalidate on. The first
    * caller in a session pays one metadata-only parquet count
    * (row-group footers, no data read); every later serve-path call
    * is a map hit, so a quantized search never fronts an O(files)
    * listing job. A corpus regenerated BETWEEN sessions re-counts
    * (new applicationId); regeneration inside a live session is
    * already outside the artifact contract (the artifact itself
    * would be stale, count or no count). */
  def cachedCount(spark: SparkSession, dir: String,
                  name: String = "embeddings"): Long =
    countCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir|$name",
      _ => java.lang.Long.valueOf(t(spark, dir, name).count())).longValue()
}
