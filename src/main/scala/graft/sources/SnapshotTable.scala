package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-lite SNAPSHOT-VERSIONED TABLE on plain parquet — the
  * transactional write path the dataset-diff/SCD2 queries stop short
  * of: immutable data files, a manifest per version listing the FILE
  * SETS composing that version, and an ATOMIC RENAME as the commit
  * point (the Iceberg/Delta idea with the catalog swap reduced to a
  * filesystem rename, atomic per-dir on HDFS/local).
  *
  * Layout under a table root:
  * {{{
  *   data/s<id>/        immutable parquet file set added by commit <id>
  *   manifests/v<id>/   parquet manifest: (dir, added_in, n_rows) rows
  *                      — PUBLISHED by rename from a _tmp dir
  * }}}
  *
  * Guarantees, and where they come from:
  *  - SNAPSHOT ISOLATION: a reader resolves one manifest and only
  *    ever touches the dirs it lists; commits add new dirs + new
  *    manifests and never mutate published ones, so an in-flight
  *    reader is untouched by any number of later commits.
  *  - ATOMIC COMMIT: the manifest is fully written (with its
  *    _SUCCESS) under `manifests/_tmp_v<id>` and renamed in; a crash
  *    before the rename leaves only unreferenced debris (invisible
  *    to readers), never a half-visible version.
  *  - OPTIMISTIC CONCURRENCY: the rename target embeds the version
  *    id, so two writers racing to commit the same version cannot
  *    both succeed — the loser's rename fails and surfaces as a
  *    retryable conflict, the Iceberg commit-conflict semantic.
  *  - TIME TRAVEL: any published version remains readable forever
  *    (no vacuum here — retention would be a separate, explicitly
  *    destructive operation).
  *
  * Scale posture: a commit writes data once plus a manifest of
  * O(commits) rows; reads open only the dirs the chosen manifest
  * lists — partition pruning and column pruning inside each dir are
  * untouched parquet behavior. Nothing is corpus-sized on the driver:
  * the manifest is the only driver-materialized relation and it is
  * O(number of commits). */
object SnapshotTable {

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Published version ids at `root`, ascending (published = the
    * rename completed; the _tmp debris of a crashed commit never
    * matches the v<id> name). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/manifests")
    val fs = fsOf(spark, root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  /** Commit `df` as the next version. `append = true` carries the
    * previous version's file sets forward (the new version = old ∪
    * new files); `append = false` is a full overwrite (the new
    * version references only the new file set — old versions stay
    * readable). Returns the committed version id. Throws
    * IllegalStateException on a commit conflict (another writer
    * published the same version id first); data-file debris from the
    * losing commit is unreferenced and harmless. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             append: Boolean = true): Int =
    commitAs(spark, root, df, latestVersion(spark, root), append)

  /** Commit with the base version PINNED — the optimistic-concurrency
    * primitive: two writers that both resolved the same `prev` race
    * for the same target id, and exactly one rename wins. */
  private[graft] def commitAs(spark: SparkSession, root: String,
                              df: DataFrame, prev: Option[Int],
                              append: Boolean): Int = {
    val next = prev.getOrElse(0) + 1
    // ATTEMPT-unique data dir (the Iceberg unique-filename rule):
    // two racers for the same version id must not write the same
    // path, or the LOSER's data write clobbers files the WINNER's
    // already-published manifest references — readers go through the
    // manifest, so the name only needs uniqueness, not meaning
    val dataRel = s"data/s$next-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$root/$dataRel")
    val nRows = spark.read.parquet(s"$root/$dataRel").count()
    val spark2 = spark
    import spark2.implicits._
    val carried = if (append) prev.toSeq.flatMap(manifestEntries(spark, root, _))
                  else Seq.empty
    val entries = carried :+ ((dataRel, next, nRows))
    entries.toDF("dir", "added_in", "n_rows")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$root/manifests/_tmp_v$next")
    val src = new org.apache.hadoop.fs.Path(s"$root/manifests/_tmp_v$next")
    val dst = new org.apache.hadoop.fs.Path(s"$root/manifests/v$next")
    // FileContext.rename with the default (no-overwrite) option is
    // the portable atomic claim: it FAILS when dst exists, where
    // FileSystem.rename on the local FS silently nests src inside an
    // existing dst directory — which would both hide the manifest
    // and mask the conflict
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fsOf(spark, root).makeQualified(dst).toUri,
      spark.sessionState.newHadoopConf())
    try fc.rename(src, dst)
    catch {
      case e: java.io.IOException =>
        fsOf(spark, root).delete(src, true)
        if (e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException]
            || fsOf(spark, root).exists(dst))
          throw new IllegalStateException(
            s"commit conflict: version $next at $root was published by " +
              "a concurrent writer; re-read the latest version and retry")
        else throw e
    }
    next
  }

  private def manifestEntries(spark: SparkSession, root: String,
                              version: Int): Seq[(String, Int, Long)] =
    spark.read.parquet(s"$root/manifests/v$version")
      .select(col("dir"), col("added_in"), col("n_rows"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(_._2)

  /** Time-travel read of a PUBLISHED version: the union of exactly
    * the file sets its manifest lists. The manifest is resolved HERE,
    * once — the returned DataFrame's scan set is fixed, so later
    * commits (or a changed "latest") cannot leak in mid-query. */
  def read(spark: SparkSession, root: String, version: Int): DataFrame = {
    val dirs = manifestEntries(spark, root, version)
    require(dirs.nonEmpty, s"version $version not published at $root")
    dirs.map { case (d, _, _) => spark.read.parquet(s"$root/$d") }
      .reduce(_ unionByName _)
  }

  def readLatest(spark: SparkSession, root: String): DataFrame =
    read(spark, root, latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(s"no versions at $root")))
}
