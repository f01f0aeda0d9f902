package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned tables join without a shuffle — the
  * co-location technique for repeated big-big joins at scale (the
  * alternative to paying an Exchange per query). */
class BucketingSpec extends SparkSessionSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans with no shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // drop leaves orphan dirs if the metastore was fresh — clear them
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // force a shuffled join strategy so bucketing (not broadcast) is
    // what removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val viaBuckets = joined.as[(String, Long)].collect().toMap
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // final adaptive plan: the ONLY shuffle is the groupBy's — the join
    // reads co-bucketed data with no Exchange on either side
    val planStr = joined.queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("o_orderstatus"),
      s"expected only the agg exchange:\n$planStr")
    val plain = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(viaBuckets == plain)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
