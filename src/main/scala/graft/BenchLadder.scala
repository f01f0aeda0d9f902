package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder measurement: warm seconds for the most expensive query
  * families across ~two decades of input growth, emitted as ONE JSON
  * object (written to BENCH_LADDER.json by scripts, printed on
  * stdout). Converts the "survives 100×" plan arguments into measured
  * growth exponents.
  *
  * Ladder datasets:
  *  - The graph family ladders the REAL driver SFs — `events` grows a
  *    clean 10× per step (1k → 10k → 100k rows).
  *  - The document/embedding families CANNOT ladder the driver SFs
  *    (documents: 500 → 500 → 5000; embeddings: 500 → 500 → 2000), so
  *    they ladder ×1/×10/×100 replications of sf0.1 written once under
  *    the artifacts root. Replicas are PERTURBED — texts get a
  *    replica-unique lead token, embeddings a small deterministic
  *    per-replica offset — because exact replication would plant
  *    pathological duplicate structure (every doc ×100 → banding
  *    buckets grow quadratically for DATA reasons) and the ladder
  *    would measure the corruption, not the operator. Replica 0 is
  *    byte-identical to the source.
  *
  * Timing mirrors graft.Bench: per point 1 cold + 3 warm runs with
  * ContextCleaner drains between, median warm reported. */
object BenchLadder {

  private def drain(): Unit = {
    System.gc(); Thread.sleep(80); System.gc(); Thread.sleep(80)
  }

  private def timeQuery(spark: SparkSession, name: String,
                        dir: String): Double = {
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      drain()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // cold
    val runs = Seq.fill(3)(once()).sorted
    runs(runs.length / 2)
  }

  /** Replicated-and-perturbed ladder dir (docs + embeddings) under the
    * artifacts root; built once, `_SUCCESS`-gated like every artifact. */
  private def ladderDir(spark: SparkSession, src: String,
                        factor: Int): String = {
    val dir = s"${graft.sources.Artifacts.root(spark)}/ladder_x$factor"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val done = new org.apache.hadoop.fs.Path(s"$dir/_LADDER_DONE")
    if (!fs.exists(done)) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val nd = docs.count()
      val reps = spark.range(factor).select(col("id").as("rep"))
      docs.crossJoin(reps)
        .withColumn("doc_id", col("doc_id") + col("rep") * nd)
        .withColumn("text",
          when(col("rep") === 0, col("text"))
            .otherwise(concat(lit("r"), col("rep"), lit(" "), col("text"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val ne = emb.count()
      emb.crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("rep") * ne)
        .withColumn("embedding",
          when(col("rep") === 0, col("embedding"))
            .otherwise(transform(col("embedding"), (x, i) =>
              x + (((col("rep") * 7 + i) % 11 - 5) * lit(0.003d))
                .cast("float"))))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      fs.create(done).close()
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s -> s"/root/testdata/$s")
    val graphFams = Seq("graph_pagerank", "graph_communities",
      "graph_sssp", "graph_triangles")
    val xFams = Seq("kmeans_full", "kmeans_par_init",
      "dedup_prefix_join", "dedup_embed_cluster", "retrieval_bm25",
      "text_langid_nb", "ann_graph_search", "ann_index_build",
      "ann_index_append", "ann_index_compact", "ann_index_search",
      "pipeline_crawl_e2e")

    // warmup: session + codegen paths
    SparkEntry.queries("km_sizes")(spark, sfDirs.last._2).count()

    val out = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashMap[String, Double]]()
    def record(fam: String, point: String, sec: Double): Unit = {
      out.getOrElseUpdate(fam,
        scala.collection.mutable.LinkedHashMap[String, Double]())
        .put(point, sec)
      System.err.println(f"[ladder] $fam%-22s $point%-8s $sec%8.2f s")
    }

    for ((sfName, dir) <- sfDirs; fam <- graphFams)
      record(fam, sfName, timeQuery(spark, fam, dir))

    val xPoints = Seq(1, 10, 100)
      .map(f => s"x$f" -> ladderDir(spark, "/root/testdata/sf0.1", f))
    for ((pName, dir) <- xPoints; fam <- xFams)
      record(fam, pName, timeQuery(spark, fam, dir))

    // last-step growth factor per family, normalized by the 10× input
    // step: ~1.0 = linear, >1 = super-linear
    val growth = out.map { case (fam, pts) =>
      val v = pts.values.toSeq
      fam -> (if (v.size >= 2 && v(v.size - 2) > 0)
        v.last / v(v.size - 2) / 10.0 else -1.0)
    }
    def m2j(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""$k": ${f"$v%.4f"}""" }.mkString("{", ", ", "}")
    val json = "{" +
      s""""points": ${out.map { case (f, p) =>
        s""""$f": ${m2j(p)}""" }.mkString("{", ", ", "}")}, """ +
      s""""growth_per_decade": ${m2j(growth)}, """ +
      s""""note": "graph_* ladders the driver SFs (events 1k/10k/100k); """ +
      """the x-families ladder perturbed x1/x10/x100 replications of """ +
      """sf0.1 (docs 5k/50k/500k, vectors 2k/20k/200k) because the """ +
      """driver's documents/embeddings tables barely grow across SFs. """ +
      """growth_per_decade ~ 1.0 = linear in the input."}"""
    println(json)
    spark.stop()
  }
}
