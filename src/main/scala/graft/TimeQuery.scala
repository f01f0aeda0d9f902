package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query end-to-end (1 cold + N warm runs)
  * with the session configured exactly like Bench.main — for attacking a
  * single slow query without paying the full bench gauntlet.
  * Usage: runMain graft.TimeQuery <query> [sfDir] [warmRuns]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warm = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b0 = SparkSession.builder()
    // bisect aid: SPARK_GRAFT_NO_EXT=1 builds the session with no
    // extensions, isolating per-plan extension-rule overhead
    val b1 = if (sys.env.contains("SPARK_GRAFT_NO_EXT")) b0
      else b0.config("spark.sql.extensions", "graft.expressions.GraftExtensions")
    val spark = b1
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.get("km_sizes").foreach(q => q(spark, sfDir).count())
    val fn = SparkEntry.queries(name)
    (0 to warm).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"${if (i == 0) "cold" else s"warm$i"}  $dt%7.3f s  ($n rows)")
    }
    spark.stop()
  }
}
