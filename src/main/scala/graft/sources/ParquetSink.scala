package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod, rand}

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

  /** Fixed directory fan-out for cell-keyed index segments: dirs are
    * `bucket = cell % CellBuckets`, NEVER one per cell. Hive
    * partitioning directly on an n-SCALED key (IVF cells grow as
    * ⌈n/256⌉, [[graft.operators.KMeansQueries.coarseK]]) is the
    * classic metadata bomb: at 100 TB that is ~400M directories of
    * 256-row files, and the r13 ladder measured it as the
    * ann_index_build super-linear term (directory/commit cost ∝ k —
    * 50 of the 69 s at the x100 rung were the 782-dir write). The
    * modulo keeps the dir count CONSTANT in corpus size while staying
    * self-describing (readers derive a cell's bucket without knowing
    * k). At the oracle SFs (k = 8 ≤ CellBuckets) every cell still owns
    * its own directory, so pruning there is unchanged. */
  val CellBuckets = 64

  /** The directory a cell's rows live in ([[writeCellBucketed]]). */
  def bucketOf(cell: Int): Int = math.floorMod(cell, CellBuckets)

  /** Write a cell-keyed segment in the bucketed layout: hive dirs on
    * the derived `bucket`, rows sorted by (bucket, cell, sortCols)
    * within each file. An equality/IN filter on the cell column prunes
    * at TWO levels: bucket dirs first (partition pruning — skipped
    * before any IO), then row groups inside the surviving files (the
    * sort gives parquet min/max stats a monotone cell layout, so a
    * probed cell touches ~one row group however big the bucket gets).
    * The cell column stays a DATA column — readers never depend on
    * directory names for it. */
  def writeCellBucketed(df: DataFrame, path: String,
                        cellCol: String = "cluster",
                        sortCols: Seq[String] = Nil,
                        filesPerDir: Int = 1): Unit = {
    val bucketed = df.withColumn("bucket",
      pmod(col(cellCol), lit(CellBuckets)).cast("int"))
    writePartitioned(bucketed, path, partitionCols = Seq("bucket"),
      sortCols = cellCol +: sortCols, filesPerDir = filesPerDir)
  }
}
