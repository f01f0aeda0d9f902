package graft

/** Driver-contract consistency checks: the things the round driver
  * assumes about SparkEntry (SURVEY.md §7 harness recap). */
class ContractSpec extends SparkSessionSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("every oracle key has a corresponding query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across operator modules") {
    // Map concatenation silently drops duplicates — assert none existed
    val sizes = Seq(
      operators.KMeansQueries.queries.size,
      operators.RelationalQueries.queries.size,
      operators.FunctionQueries.queries.size,
      operators.Dedup.queries.size,
      operators.Similarity.queries.size,
      operators.AnnIndex.queries.size,
      operators.TextAnalysis.queries.size,
      operators.Multimodal.queries.size,
      operators.Jpeg.queries.size,
      operators.Gif.queries.size,
      operators.Archives.queries.size,
      operators.Warc.queries.size,
      operators.Adpcm.queries.size,
      operators.Avi.queries.size,
      operators.Pipeline.queries.size,
      operators.Events.queries.size)
    assert(SparkEntry.queries.size == sizes.sum,
      "duplicate query name collapsed during module union")
  }

  test("SURVEY §2.3 names every registered query (map cannot drift)") {
    // the round-5 verdict caught ann_refine registered but unlisted;
    // this pins SURVEY.md's implementation map ⊇ SparkEntry.queries
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val unlisted = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(unlisted.isEmpty,
      s"queries missing from SURVEY.md §2.3: ${unlisted.toSeq.sorted}")
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sampleCentroids is invariant to partition layout") {
    val pts = (1 to 500).map(i => Seq(i.toDouble, (i * 7 % 100).toDouble))
    def sample(parts: Int) = kmeans.KMeansRunner.sampleCentroids(
      pts.toDF("v").repartition(parts), "v", 5, seed = 99L)
      .map(_.toSeq).toSeq
    assert(sample(1) == sample(13))
  }
}
