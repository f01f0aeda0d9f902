package graft.kmeans

import org.apache.spark.sql.SparkSession

/** Drop-in CLI with the reference driver's exact argument contract
  * (/root/reference/kmeans/.../KMeans.java:99-109):
  *
  *   <input> <k> <max_iter> <output> <dim> <epsilon> <num_reducer>
  *
  * - input: points text file(s), one `<x1, x2, …>` per line (O2 format);
  * - output: per-iteration directory `output + iter` of
  *   `clusterId\t<coords>` lines (KMeans.java:148-150 behavior);
  * - dim is accepted and, unlike the reference (which prints and ignores
  *   it, KMeans.java:107), validated against the data;
  * - num_reducer maps to spark.sql.shuffle.partitions (the reference's
  *   job.setNumReduceTasks, KMeans.java:133);
  * - epsilon/max_iter/empty-cluster semantics are KMeansRunner's
  *   faithful reproduction; a run summary in the reference's
  *   outputsLog.txt spirit goes to stdout.
  *
  * Improvements over the reference, documented in SURVEY.md §2 quirks
  * (not semantics): seeded init (reproducible; seed via
  * GRAFT_SEED env, default 42), no k≤10 id-parse limit, input cached
  * once instead of re-read per iteration.
  */
object KMeansCli {
  def main(args: Array[String]): Unit = {
    if (args.length != 7) {
      System.err.println(
        "usage: KMeansCli <input> <k> <max_iter> <output> <dim> <epsilon> <num_reducer>")
      sys.exit(2)
    }
    val Array(input, kS, maxIterS, output, dimS, epsS, nRedS) = args
    val (k, maxIter, dim, eps, nRed) =
      (kS.toInt, maxIterS.toInt, dimS.toInt, epsS.toDouble, nRedS.toInt)
    val seed = sys.env.getOrElse("GRAFT_SEED", "42").toLong

    // only stop the session if this main created it (embedded callers —
    // tests, notebooks — keep theirs)
    val ownsSession = SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-kmeans")
      .config("spark.sql.shuffle.partitions", nRed.max(1))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val points = PointsIO.readPoints(spark, input)
    val d0 = points.head().getSeq[Double](0).size
    require(dim <= 0 || d0 == dim,
      s"declared dim=$dim but data has $d0 coordinates")

    val res = KMeansRunner.run(points, "point", k, maxIter, eps, seed)

    // per-iteration output dirs like the reference would have written;
    // we emit the final one — output + lastRound, the suffix of the
    // reference's LAST job (it breaks before iter++ on convergence, so
    // a run converging at round N ends at output+N; a bounded run at
    // output+(maxIter-1)) — plus a run log on stdout. maxIter=1 runs
    // zero jobs and, like the reference, writes no output dir.
    val spark2 = spark
    import spark2.implicits._
    if (res.lastRound >= 1) {
      val outDf = res.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cluster", "centroid")
      PointsIO.writeCentroids(outDf, "cluster", "centroid",
        output + res.lastRound)
    }

    val secs = (System.nanoTime() - t0) / 1e9
    println(f"iterations=${res.iterations} finalError=${res.finalError}%.6f " +
      f"reinits=${res.reinitCount} seconds=$secs%.2f")
    res.errorLog.zipWithIndex.foreach { case (e, i) =>
      println(f"iter=${i + 1} error=$e%.6f")
    }
    if (ownsSession) spark.stop()
  }
}
