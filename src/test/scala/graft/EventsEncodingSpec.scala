package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Events

/** Round-7 regression armor: the driver regenerated `events.parquet`
  * with `ts` as `timestamp[us]` where every prior generation shipped
  * `timestamp[ns]`, and the then-hardcoded nano-long ingestion took all
  * 13 ev_* queries off the correctness board at analysis time. This
  * spec fabricates the SAME wall-clock instants under every physical
  * encoding the testdata has ever shipped (plus the ones it plausibly
  * could) and pins Events.withTsUs to one identical `ts_us` answer —
  * so the next regeneration cannot silently break the family again.
  *
  * Fixture files (src/test/resources/events_encodings/, committed):
  *   events_ts_us_ntz  timestamp[us]          → Spark TIMESTAMP_NTZ
  *   events_ts_us_utc  timestamp[us, tz=UTC]  → Spark TIMESTAMP
  *   events_ts_ns      timestamp[ns]          → nano LONG (nanosAsLong)
  *   events_ts_ns_utc  timestamp[ns, tz=UTC]  → nano LONG (nanosAsLong)
  * The instants include sub-millisecond precision and span a US-DST
  * transition hour, so a session-zone round-trip bug would surface.
  */
class EventsEncodingSpec extends SparkSessionSpec {

  private val expectedUs = Map(
    1L -> 1710000000123456L,
    2L -> 1710064800000001L,
    3L -> 1710068399999999L,
    4L -> 1262304000000000L,
    5L -> 1893456000654321L)

  private def fixture(name: String): DataFrame = {
    val url = getClass.getResource(s"/events_encodings/$name.parquet")
    assert(url != null, s"missing fixture $name")
    spark.read.parquet(url.getPath)
  }

  private def tsUsOf(df: DataFrame): Map[Long, Long] =
    Events.withTsUs(df).select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  for (name <- Seq("events_ts_us_ntz", "events_ts_us_utc",
    "events_ts_ns", "events_ts_ns_utc"))
    test(s"withTsUs yields identical epoch-µs from $name") {
      assert(tsUsOf(fixture(name)) === expectedUs)
    }

  test("withTsUs accepts a raw nano-long ts column (in-memory frame)") {
    import spark.implicits._
    val df = expectedUs.toSeq.map { case (id, us) => (id, us * 1000L) }
      .toDF("event_id", "ts")
    assert(tsUsOf(df) === expectedUs)
  }

  test("withTsUs rejects an unsupported ts type loudly") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Events.withTsUs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
