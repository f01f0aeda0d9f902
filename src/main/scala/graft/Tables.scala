package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata (TESTDATA.md).
  * Plain `spark.read.parquet` — filters/projections in the queries reach
  * the scan via Catalyst pushdown (verify with `.explain("formatted")`:
  * PushedFilters / ReadSchema). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
