package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.kmeans.{KMeansOps, KMeansRunner}

/** Dev profiling harness for the headline kmeans sec/iter metric —
  * prints PER-ITERATION wall + cumulative JVM GC time so thread-count /
  * GC / shuffle-layout effects are visible instead of folded into one
  * median (the r2 local[32] 2M-row regression was invisible in the
  * aggregate number). Knobs via env:
  *   SPARK_GRAFT_CPUS   threads (default all)
  *   BKM_N              rows (default 2000000)
  *   BKM_ITERS          iterations (default 8)
  *   BKM_SHUFFLE        shuffle partitions (default = cpus)
  *   BKM_AQE            adaptive on/off (default true)
  */
object BenchKMeans {
  def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  /** Whole-process CPU nanos (all threads) — the contention
    * discriminator: when per-iteration WALL varies between runs of an
    * identical jar while per-iteration CPU stays flat, the delta is
    * host steal / noisy neighbors, not a plan or code change (the r16
    * uniform "k-means family regression" diagnosis). */
  def cpuNs: Long = ManagementFactory.getOperatingSystemMXBean match {
    case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
    case _ => -1L
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val n = sys.env.getOrElse("BKM_N", "2000000").toLong
    val iters = sys.env.getOrElse("BKM_ITERS", "8").toInt
    val shuffle = sys.env.getOrElse("BKM_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("BKM_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optionally replay the full per-query bench gauntlet first to
    // reproduce the storage/listener state the headline grid runs under
    sys.env.get("BKM_GAUNTLET").foreach { sfDir =>
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        (0 until 4).foreach { _ =>
          try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        }
      }
      val status = spark.sparkContext.getRDDStorageInfo
      println(s"persisted RDDs after gauntlet: ${status.length}")
      status.sortBy(-_.memSize).take(12).foreach { i =>
        println(f"  ${i.memSize / 1e6}%9.1f MB mem ${i.diskSize / 1e6}%9.1f MB disk  ${i.name}")
      }
    }

    // optionally run the 100k/400k headline grids first (full Bench.main
    // reproduction of the state the 2M point runs under)
    if (sys.env.get("BKM_GRIDS").contains("true")) {
      println(f"grid 100k: ${Bench.kmeansSecPerIter(spark, 100000L, 30, 4, 12)}%.3f")
      println(f"grid 400k: ${Bench.kmeansSecPerIter(spark, 400000L, 30, 4, 12)}%.3f")
    }
    // optional candidate fix: drop cached plans + force a GC so the
    // ContextCleaner drains the gauntlet's accumulated weak refs before
    // the timed loop starts
    if (sys.env.get("BKM_CLEAN").contains("true")) {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(2000)
    }

    val pts = Bench.blobs(spark, n, 30, 4, seed = 7L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = KMeansRunner.sampleCentroids(pts, "v", 4, seed = 7L)
    println(s"cpus=$cpus n=$n shuffle=$shuffle aqe=$aqe " +
      s"partitions=${pts.rdd.getNumPartitions}")
    (0 until iters).foreach { i =>
      val g0 = gcMs; val c0 = cpuNs; val t0 = System.nanoTime()
      val rows = KMeansOps.lloydRound(pts, "v", centroids).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (cpuNs - c0) / 1e9
      val byId = rows.map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      if (byId.size == 4) centroids = Array.tabulate(4)(byId(_))
      println(f"iter $i%2d  ${dt}%7.3f s   cpu ${dc}%7.3f s   gc +${gcMs - g0}%5d ms")
    }
    pts.unpersist()
    Caches.releaseAll(spark)
    spark.stop()
  }
}
