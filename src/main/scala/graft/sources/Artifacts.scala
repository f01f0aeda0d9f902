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

  /** Cheap content fingerprint of one or more SOURCE directories, for
    * keying derived build-once artifacts: a stable hash over every
    * file's (relative name, length, mtime) under each path. Row counts
    * alone cannot invalidate a regenerated corpus (TPC-H counts are
    * deterministic per SF — same dir + same SF would silently reuse
    * stale edges), while a listing is one driver-side metadata call
    * per source dir — microseconds against the derivation the artifact
    * saves, and the exact signal a rewrite changes (parquet part files
    * get fresh mtimes and almost always fresh sizes). Hidden files
    * (_SUCCESS, .crc) are skipped: they carry no data and some writers
    * touch them independently. */
  def sourceFingerprint(spark: SparkSession, paths: String*): String = {
    val conf = spark.sessionState.newHadoopConf()
    val parts = paths.sorted.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (!fs.exists(hp)) s"$p:absent"
      else {
        val files = fs.listStatus(hp).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map(s => s"${s.getPath.getName}|${s.getLen}|${s.getModificationTime}")
        s"$p:${files.mkString(",")}"
      }
    }
    // 64-bit FNV-1a over the manifest — stable across JVMs (contrast
    // String.hashCode's 32 bits: fine too, but collisions are cheaper
    // to rule out at 64)
    var h = 0xcbf29ce484222325L
    parts.mkString(";").foreach { ch =>
      h ^= ch.toLong; h *= 0x100000001b3L
    }
    java.lang.Long.toHexString(h)
  }
}
