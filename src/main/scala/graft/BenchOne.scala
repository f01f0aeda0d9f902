package graft

/** Dev-loop single-query timer: `runMain graft.BenchOne <sfDir>
  * <query>[,<query>…] [runs]` — times each named [[SparkEntry]] query
  * cold-then-warm and prints the warm median. NOT the driver contract
  * ([[Bench]] is); this exists so a tuning loop can measure one query
  * without paying the full gauntlet, with the same drain
  * discipline Bench uses so the numbers are comparable. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val j0 = BenchLadder.cpuJiffies()
      val ts = (0 to runs).map { _ =>
        System.gc(); Thread.sleep(80); System.gc(); Thread.sleep(80)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // host-steal annotation over the whole query window (the
      // BenchLadder weather report): numbers sampled under neighbor
      // load must say so, or a no-code-change rerun reads as a
      // regression
      val st = BenchLadder.stealPct(j0, BenchLadder.cpuJiffies())
      val warm = ts.drop(1).sorted
      println(f"[benchone] $name%s cold=${ts.head}%.3f " +
        f"warm_median=${warm(warm.length / 2)}%.3f " +
        s"warm=${warm.map(t => f"$t%.3f").mkString(",")}" +
        f" steal=$st%.0f%%")
    }
    Caches.releaseAll(spark)
    spark.stop()
  }
}
