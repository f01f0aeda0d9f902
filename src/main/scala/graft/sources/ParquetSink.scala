package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
}
