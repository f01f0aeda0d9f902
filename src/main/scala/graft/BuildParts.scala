package graft.operators
import org.apache.spark.sql.functions._
object BuildParts {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[part] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    // warm
    KMeansQueries.coarseCentroids(spark, dir)
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val cents = t("coarseCentroids")(KMeansQueries.coarseCentroids(spark, dir))
      val cb = t("pqCodebook")(Similarity.pqCodebook(spark, dir))
      val emb = graft.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), graft.functions.VectorFunctions.toDoubleVec(col("embedding")).as("v"), col("label"))
      val encoded = AnnIndex.encode(emb, cents, cb)
      t("encode forced (sum packed)")(encoded.agg(sum(col("packed")), sum(col("code_3")), sum(col("cluster"))).collect())
      if (round == 1) {
        val plan = encoded.queryExecution.executedPlan.toString
        println("[plan] nearest_centroid hits: " + "nearest_centroid".r.findAllIn(plan).size)
        println("[plan] pq hits: " + "pq_encode".r.findAllIn(plan).size)
        println("[plan] transform/lambda hits: " + "transform\\(".r.findAllIn(plan).size)
      }
      val path = s"/tmp/diag_codes_$round"
      t("writeCellBucketed codes")(graft.sources.ParquetSink.writeCellBucketed(
        encoded, path, sortCols = Seq("vec_id")))
      t("read-back agg")(spark.read.parquet(path)
        .groupBy(col("cluster")).agg(count(lit(1)), sum(col("packed"))).count())
    }
    spark.stop()
  }
}
