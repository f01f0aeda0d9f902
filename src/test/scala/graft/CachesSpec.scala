package graft

import org.apache.spark.storage.StorageLevel

/** [[Caches]] two-tier lifecycle: between-queries [[Caches.release]]
  * keeps a bounded recent ring (cross-query artifact reuse), overflow
  * evicts oldest-first, an already-cached twin never double-persists
  * (the re-cache warning path), and [[Caches.releaseAll]] drops
  * everything. */
class CachesSpec extends SparkSessionSpec {

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("release keeps a bounded recent ring and evicts oldest-first") {
    spark.conf.set("spark.graft.caches.keep", "2")
    try {
      val dfs = (0 until 4).map(i => spark.range(100 + i).toDF("id"))
      dfs.foreach { df =>
        Caches.persisted(df)
        df.count()
        Caches.release(spark)
      }
      assert(cached(dfs(2)) && cached(dfs(3)),
        "the two most recent queries' frames must stay cached")
      assert(!cached(dfs(0)) && !cached(dfs(1)),
        "older frames must evict once the ring is over budget")
    } finally {
      spark.conf.set("spark.graft.caches.keep",
        Caches.DefaultKeep.toString)
      Caches.releaseAll(spark)
    }
  }

  test("an already-cached twin plan is not re-persisted (no re-cache), " +
       "and keep=0 restores release-everything") {
    spark.conf.set("spark.graft.caches.keep", "0")
    try {
      val a = spark.range(77).toDF("id")
      Caches.persisted(a)
      a.count()
      // same canonical plan: must be served by a's entry, not tracked
      val b = spark.range(77).toDF("id")
      Caches.persisted(b)
      assert(cached(b), "the twin must read the existing cache entry")
      // keep=0: release drops exactly the ONE tracked frame (the twin
      // was never tracked — evicting it twice would double-count)
      assert(Caches.release(spark) == 1)
      assert(!cached(a) && !cached(b))
    } finally {
      spark.conf.set("spark.graft.caches.keep",
        Caches.DefaultKeep.toString)
      Caches.releaseAll(spark)
    }
  }

  test("releaseAll drops both tiers") {
    val a = spark.range(88).toDF("id")
    val b = spark.range(89).toDF("id")
    Caches.persisted(a); a.count()
    Caches.release(spark) // a moves to the kept ring
    Caches.persisted(b); b.count() // b still in the per-query bin
    assert(Caches.releaseAll(spark) == 2)
    assert(!cached(a) && !cached(b))
  }
}
