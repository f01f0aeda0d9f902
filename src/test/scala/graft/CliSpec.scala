package graft

import graft.kmeans.{KMeansCli, PointsIO}

/** End-to-end drive of the reference CLI contract: text points in,
  * per-iteration output dir of `id\t<coords>` lines out, reference
  * argument order (input k max_iter output dim epsilon num_reducer). */
class CliSpec extends SparkSessionSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("KMeansCli runs the 7-arg contract end-to-end on reference-format text") {
    spark.sparkContext // shared session up first (CLI must not stop it)
    val dir = java.nio.file.Files.createTempDirectory("cli_e2e").toFile
    val input = new java.io.File(dir, "points.txt").getAbsolutePath
    val outPrefix = new java.io.File(dir, "out").getAbsolutePath

    // two tight blobs at (0,0) and (50,50)
    val rnd = new scala.util.Random(33)
    val lines = (0 until 200).map { i =>
      val c = if (i % 2 == 0) 0.0 else 50.0
      s"<${c + rnd.nextGaussian() * 0.1}, ${c + rnd.nextGaussian() * 0.1}>"
    }
    val w = new java.io.PrintWriter(input)
    lines.foreach(w.println); w.close()

    KMeansCli.main(Array(input, "2", "15", outPrefix, "2", "0.0001", "4"))

    // the CLI writes exactly one dir: outPrefix + lastRound
    val outDirs = dir.listFiles().filter(_.getName.startsWith("out"))
    assert(outDirs.length == 1, outDirs.map(_.getName).toSeq)
    val centroids = PointsIO.readCentroids(spark,
      outDirs.head.getAbsolutePath)
      .orderBy(col("cluster"))
      .as[(Int, Seq[Double])].collect()
    assert(centroids.map(_._1).toSeq == Seq(0, 1))
    // each blob center matched by exactly one centroid
    Seq(0.0, 50.0).foreach { c =>
      assert(centroids.exists { case (_, v) =>
        math.hypot(v(0) - c, v(1) - c) < 0.5 })
    }
    // session survived the CLI (ownership guard)
    assert(!spark.sparkContext.isStopped)
  }
}
