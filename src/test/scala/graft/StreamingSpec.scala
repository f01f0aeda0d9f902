package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.SEvent

/** Streaming==batch equivalence: the Structured Streaming operators must
  * produce exactly the batch results on the same (replayed) input. */
class StreamingSpec extends SparkSessionSpec {
  import spark.implicits._

  private lazy val batchEvents: Seq[SEvent] =
    Events.events(spark, sf0001)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect()
      .map { case (id, tsUs, uid, et, v) =>
        SEvent(id, new Timestamp(tsUs / 1000), tsUs, uid, et, v)
      }.toSeq

  private def maxUs = batchEvents.map(_.ts_us).max

  private def sentinel(offsetUs: Long) =
    SEvent(-1L, new Timestamp((maxUs + offsetUs) / 1000), maxUs + offsetUs,
      -1L, "sentinel", 0.0)

  test("streaming hourlyAgg equals batch evHourly once windows close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.hourlyAgg(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      mem.addData(batchEvents)
      q.processAllAvailable()
      mem.addData(sentinel(3L * 3600 * 1000 * 1000)) // advance watermark
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hourly")
      .where(col("event_type") =!= "sentinel")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Events.evHourly(spark, sf0001)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming sessionize equals batch evSessionize after timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(batchEvents)
      q.processAllAvailable()
      // two extra batches: watermark advances after the batch that read
      // the sentinel, timeouts fire in the one after
      mem.addData(sentinel(24L * 3600 * 1000 * 1000))
      q.processAllAvailable()
      mem.addData(sentinel(25L * 3600 * 1000 * 1000))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sessions")
      .where(col("user_id") >= 0)
      .select("user_id", "session_id", "n_events", "start_us", "end_us",
        "duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = Events.evSessionize(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming dedupById drops in-batch duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.dedupById(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      val dupes = batchEvents.take(50)
      mem.addData(batchEvents ++ dupes)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("deduped").count() == batchEvents.size)
  }

  test("streaming as-of join equals batch evAsof") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.asofClicks(mem.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      // two in-order batches: state must carry clicks across batches
      val (b1, b2) = batchEvents.sortBy(e => (e.ts_us, e.event_id))
        .splitAt(batchEvents.size / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("asof")
      .select("user_id", "event_id", "ts_us", "last_click_us")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val batch = Events.evAsof(spark, sf0001)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-stream interval join equals the batch range-join pairs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.recentClickPairs(mem.toDF())
      .writeStream.format("memory").queryName("clickpairs")
      .outputMode("append").start()
    try {
      mem.addData(batchEvents)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("clickpairs")
      .as[(Long, Long, Long, Long)].collect().toSet
    val h = StreamingOps.HourUs
    val clicks = batchEvents.filter(_.event_type == "click")
    val expected = (for {
      p <- batchEvents.filter(_.event_type == "purchase")
      c <- clicks
      if c.user_id == p.user_id &&
        c.ts_us >= p.ts_us - h && c.ts_us < p.ts_us
    } yield (p.user_id, p.event_id, p.ts_us, c.ts_us)).toSet
    assert(expected.nonEmpty && streamed == expected)
  }

  test("streaming funnel conversion counts equal batch evFunnel") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      val (b1, b2) = batchEvents.sortBy(e => (e.ts_us, e.event_id))
        .splitAt(batchEvents.size / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("funnel")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        count(when(col("converted"), 1)).as("n_converted"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = Events.evFunnel(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("StreamingKMeans converges to blob centers over micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(21)
    val blobs = Seq(Array(0.0, 0.0), Array(40.0, 0.0), Array(0.0, 40.0))
    def batch(n: Int): Seq[Seq[Double]] = (0 until n).map { i =>
      val c = blobs(i % 3)
      Seq(c(0) + rnd.nextGaussian(), c(1) + rnd.nextGaussian())
    }
    // init near (but not at) the blob centers: streaming k-means refines
    val init = Array(Array(3.0, 3.0), Array(35.0, 5.0), Array(5.0, 35.0))
    val skm = new graft.streaming.StreamingKMeans(3, decay = 0.9, init)
    val mem = MemoryStream[Seq[Double]]
    val q = skm.fit(mem.toDF().withColumnRenamed("value", "v"), "v")
    try {
      (0 until 5).foreach { _ =>
        mem.addData(batch(300))
        q.processAllAvailable()
      }
    } finally q.stop()
    val st = skm.current
    assert(st.batches == 5L)
    blobs.foreach { b =>
      val best = st.centroids.map(c =>
        math.hypot(c(0) - b(0), c(1) - b(1))).min
      assert(best < 0.5,
        s"blob ${b.toSeq} unmatched: ${st.centroids.map(_.toSeq).toSeq}")
    }
    assert(st.weights.forall(_ > 0))
  }

  test("runningUserCounts final state equals batch per-user counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val q = StreamingOps.runningUserCounts(mem.toDS())
      .toDF("user_id", "n")
      .writeStream.format("memory").queryName("usercounts")
      .outputMode("update").start()
    try {
      mem.addData(batchEvents)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("usercounts")
      .groupBy("user_id").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toSet
    val batch = Events.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
