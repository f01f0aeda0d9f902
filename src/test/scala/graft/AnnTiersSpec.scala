package graft

import graft.operators.{AnnIndex, AnnTiers, Similarity}

/** The unified tier index's delete contract: ONE tombstone hides a
  * vector from EVERY quantized tier (BQ, BQ+refine, SQ8, graph), and
  * compaction reclaims it physically without changing results — the
  * oracle-gated registered queries never see tombstones (the synthetic
  * corpus retracts nothing), so this lifecycle is spec-pinned on an
  * isolated artifacts root. */
class AnnTiersSpec extends SparkSessionSpec {

  private val sf = "/root/testdata/sf0.001"

  private def neighborsOf(
      df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("neighbor_id").collect().map(_.getLong(0)).toSet

  test("one tombstone hides a vector from every tier; compaction " +
       "reclaims it and preserves results") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tiers").toString
    spark.conf.set("spark.graft.artifacts.dir", tmp)
    try {
      val before = Map(
        "bq" -> neighborsOf(Similarity.annBq(spark, sf)),
        "bq_refine" -> neighborsOf(Similarity.annBqRefine(spark, sf)),
        "sq8" -> neighborsOf(Similarity.annSq8(spark, sf)),
        "ivfpqr" -> neighborsOf(Similarity.annIvfPqResidual(spark, sf)),
        "graph" -> neighborsOf(Similarity.annGraphSearch(spark, sf)))
      // a victim every tier currently returns would be the strongest
      // witness but need not exist; any returned non-query vector
      // proves its own tiers, and the others prove absence stays
      // absence
      val victim = before.values.flatten
        .filter(_ >= Similarity.NQueries)
        .groupBy(identity).maxBy { case (id, occ) => (occ.size, -id) }._1
      val hitTiers = before.filter(_._2.contains(victim)).keySet
      assert(hitTiers.nonEmpty, "victim must appear in at least one tier")

      AnnTiers.deleteVectors(spark, sf, Seq(victim))
      val after = Map(
        "bq" -> neighborsOf(Similarity.annBq(spark, sf)),
        "bq_refine" -> neighborsOf(Similarity.annBqRefine(spark, sf)),
        "sq8" -> neighborsOf(Similarity.annSq8(spark, sf)),
        "ivfpqr" -> neighborsOf(Similarity.annIvfPqResidual(spark, sf)),
        "graph" -> neighborsOf(Similarity.annGraphSearch(spark, sf)))
      after.foreach { case (tier, ids) =>
        assert(!ids.contains(victim),
          s"tier $tier still returns tombstoned vector $victim")
      }

      // compaction drops the tombstone segment and rewrites the code/
      // graph segments without the dead rows — results must not move
      AnnTiers.compact(spark, sf)
      val root = AnnTiers.root(spark, sf)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/deletes")),
        "compaction must drop the tombstone segment")
      val compacted = Map(
        "bq" -> neighborsOf(Similarity.annBq(spark, sf)),
        "bq_refine" -> neighborsOf(Similarity.annBqRefine(spark, sf)),
        "sq8" -> neighborsOf(Similarity.annSq8(spark, sf)),
        "ivfpqr" -> neighborsOf(Similarity.annIvfPqResidual(spark, sf)))
      compacted.foreach { case (tier, ids) =>
        assert(ids == after(tier),
          s"tier $tier results moved across compaction")
      }
      // the graph tier is the one tier where compaction MAY move
      // results: the victim stopped being NAVIGABLE (its edges died
      // with it — the FreshDiskANN semantic), so beams can reach a
      // different frontier. Pin only the contract: still absent,
      // still serving
      val graphC = neighborsOf(Similarity.annGraphSearch(spark, sf))
      assert(!graphC.contains(victim) && graphC.nonEmpty,
        "graph tier must stay victim-free and non-empty after compaction")
    } finally {
      spark.conf.unset("spark.graft.artifacts.dir")
    }
  }

  test("deleteVectors appends per-batch tombstone segments: O(batch) " +
       "writes, batches union at read, legacy layout migrates, torn " +
       "tmp dirs are ignored") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tiers_batches").toString
    spark.conf.set("spark.graft.artifacts.dir", tmp)
    try {
      val before = neighborsOf(Similarity.annBq(spark, sf))
      val victims = before.filter(_ >= Similarity.NQueries)
        .toSeq.sorted.take(2)
      assert(victims.size == 2, "need two deletable BQ neighbors")
      val root = AnnTiers.root(spark, sf)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def path(s: String) = new org.apache.hadoop.fs.Path(s"$root/$s")

      // seed a LEGACY root-layout tombstone segment (pre-batch
      // format: files + _SUCCESS at the segment root) holding
      // victim 0 — the first append must migrate it, not clobber it
      val spark2 = spark
      import spark2.implicits._
      Seq(victims(0)).toDF("vec_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/deletes")
      assert(fs.exists(path("deletes/_SUCCESS")), "legacy seed")

      AnnTiers.deleteVectors(spark, sf, Seq(victims(1)))
      val base = AnnIndex.MaintBatchBase
      assert(fs.exists(path(s"deletes/batch_id=$base")),
        "legacy segment must migrate into the maintenance id range " +
          "(stream micro-batch ids can never collide with it)")
      assert(fs.exists(path(s"deletes/batch_id=${base + 1}")),
        "the append must land as its own batch")
      assert(!fs.listStatus(path("deletes")).exists(_.isFile),
        "no loose files may remain at the segment root (data AND " +
          "_SUCCESS move — _SUCCESS last, so a torn migration is " +
          "finished by the next append, never read as committed)")

      // a torn in-flight batch (crash before the publishing rename)
      // must be invisible to readers
      fs.mkdirs(path("deletes_batch_tmp_99"))
      fs.create(path("deletes_batch_tmp_99/part-junk.parquet"), true)
        .close()

      val after = neighborsOf(Similarity.annBq(spark, sf))
      victims.foreach(v => assert(!after.contains(v),
        s"tombstoned vector $v still served after batched deletes"))
    } finally {
      spark.conf.unset("spark.graft.artifacts.dir")
    }
  }
}
