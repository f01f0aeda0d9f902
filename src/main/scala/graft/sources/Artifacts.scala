package graft.sources

import org.apache.spark.sql.SparkSession

/** Root directory for engine-WRITTEN artifacts (persisted ANN indexes,
  * sink round-trips): `spark.graft.artifacts.dir` when set, else the
  * JVM tmpdir.
  *
  * On a real cluster the conf MUST point at a shared filesystem
  * (HDFS/S3/...) — executors write sink files and the driver resolves
  * read-back globs against the same root, so a machine-local default
  * like tmpdir is only correct in local mode, where driver and
  * executors share one machine. Every artifact-writing query resolves
  * through here, so one conf key moves them all to the shared FS.
  */
object Artifacts {
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifacts.dir")
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft_artifacts")
}
