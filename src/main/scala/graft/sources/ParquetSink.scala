package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, rand}

/** Partition-layout-aware parquet sink — the write side of the 100 TB
  * posture. Hive-style `partitionBy` directories turn equality filters
  * on the partition columns into PARTITION PRUNING at read time (whole
  * directories skipped before any IO), and the repartition +
  * sortWithinPartitions below shapes the files:
  *
  *  - `repartition(partitionCols)` routes each output partition's rows
  *    to one task → one file per partition dir instead of
  *    tasks × partitions small files (the classic small-files bomb);
  *  - the within-partition sort on `sortCols` gives parquet row-group
  *    min/max stats a monotone layout, so range predicates on those
  *    columns skip row groups (stats-based pruning under the
  *    partition pruning).
  */
object ParquetSink {

  /** `filesPerDir > 1` salts the routing for HOT partition values: with
    * plain `repartition(partitionCols)` every row of a dominant value
    * (one language owning half a 100 TB corpus) lands on ONE task —
    * the write-side skew bomb. The salt fans each partition dir over
    * `filesPerDir` tasks/files while keeping the dir count exact. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil,
                       filesPerDir: Int = 1): Unit = {
    require(filesPerDir >= 1)
    val routed =
      if (filesPerDir == 1) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        partitionCols.map(col) :+ (rand(7L) * filesPerDir).cast("int"): _*)
    routed
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
