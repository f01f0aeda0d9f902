package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The LSH stop-bucket screen must BIND at small scale: the planted
  * 600-copy block of [[Dedup.dedupEmbedLshStop]] saturates its bucket
  * in every band, so no planted id may reach the candidate join — and
  * the organic corpus must keep its pairs. This is the screen's
  * recall contract pinned as an executable fact (previously the cap,
  * 512, exceeded every automated corpus and both implementations of
  * the screen ran only as no-ops). */
class DedupStopBucketSpec extends SparkSessionSpec {

  test("planted mega-bucket is screened out; organic pairs survive") {
    val out = Dedup.dedupEmbedLshStop(spark, sf0001)
      .persist()
    try {
      val planted = out.where(
        col("id_a") >= Dedup.PlantedBaseId ||
          col("id_b") >= Dedup.PlantedBaseId).count()
      // without the screen the planted block alone emits
      // 600·599/2 = 179_700 exact-duplicate pairs (cosine 1.0)
      assert(planted == 0L,
        s"stop-bucket screen did not bind: $planted planted pairs")
      assert(out.count() > 0L, "screen removed the organic pairs too")
    } finally { out.unpersist(); () }
  }

  test("screen output is a subset of the unscreened family's semantics") {
    // every surviving pair must be a genuine same-bucket candidate of
    // the planted corpus with verified cosine — cross-checked against
    // the plain corpus run: organic pairs can only be REMOVED by the
    // planted collisions (vec 0's buckets may saturate), never added
    val spark2 = spark
    import spark2.implicits._
    val stop = Dedup.dedupEmbedLshStop(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val base = Dedup.dedupEmbedLsh(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(stop.subsetOf(base),
      s"planting ADDED organic pairs: ${(stop -- base).take(5)}")
  }
}
