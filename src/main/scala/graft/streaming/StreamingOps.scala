package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming mirrors of the batch event operators
  * (graft.operators.Events): the same logical transforms expressed over
  * an unbounded source with watermarks and state. The reference engine
  * has no streaming at all (SURVEY.md §2.1) — this is part of the
  * mandated extension surface. ScalaTest drives these with MemoryStream
  * and asserts equality with the batch results.
  *
  * Scale posture: every operator keys its state by a high-cardinality
  * column (event_type windows, event_id dedup, user_id sessions), so
  * state partitions across executors; watermarks bound state size.
  */
object StreamingOps {

  /** `ts` (ms precision) drives watermarks; `ts_us` carries the exact
    * microsecond epoch used for session math, matching the batch side. */
  final case class SEvent(event_id: Long, ts: java.sql.Timestamp,
                          ts_us: Long, user_id: Long, event_type: String,
                          value: Double)

  final case class SessionOut(user_id: Long, session_id: Long,
                              n_events: Long, start_us: Long, end_us: Long,
                              duration_us: Long)

  final case class SessState(sessionId: Long, nEvents: Long,
                                     startUs: Long, endUs: Long)

  /** Tumbling 1-hour windowed aggregation with a 1-hour watermark —
    * the streaming form of Events.evHourly. Append mode: windows emit
    * once the watermark passes their end. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once-style dedup by event_id within the watermark horizon —
    * the streaming form of exact dedup (state = ids seen, bounded by
    * the watermark). */
  def dedupById(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Streaming cardinality: distinct users per event type via the
    * HyperLogLog++ sketch — exact distinct-count state in a stream is
    * unbounded (every key ever seen), while the sketch is a few KB per
    * group FOREVER and merges associatively across micro-batches,
    * which is exactly why production streaming cardinality is always
    * sketch-based. Complete mode: the running estimate per type.
    * StreamingSpec pins streaming == batch `approx_count_distinct`
    * (identical sketch, identical estimate) and the ±5% envelope vs
    * exact — the same witness structure as `q_approx_distinct`. */
  def runningDistinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))

  /** Stream-static enrichment join — the remaining join mode the
    * streaming surface lacked (stream-stream interval join is
    * [[recentClickPairs]]): each micro-batch of the stream hash-joins a
    * STATIC dimension (user profile / allowlist / model registry). The
    * static side is planned per micro-batch, so a broadcast hint keeps
    * it off the shuffle path entirely — the streaming analogue of the
    * reference's centroid broadcast (`ref:KMeans.java:152-157`).
    * Stateless: no watermark needed, rows enrich and flow through. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("segment"))

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Gap-based sessionization via flatMapGroupsWithState with event-time
    * timeout — the streaming form of Events.evSessionize. A session
    * closes (and emits) when a newer event for the same user arrives
    * past the gap, or when the watermark passes last_event + gap. */
  def sessionize(events: Dataset[SEvent]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[SessState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed end + gap: close the open session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.sessionId, s.nEvents,
              s.startUs, s.endUs, s.endUs - s.startUs))
          } else {
            val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L))
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val tUs = e.ts_us
              if (st.nEvents == 0L) {
                st = SessState(st.sessionId + 1, 1L, tUs, tUs)
              } else if (tUs - st.endUs > SessionGapUs) {
                out += SessionOut(userId, st.sessionId, st.nEvents,
                  st.startUs, st.endUs, st.endUs - st.startUs)
                st = SessState(st.sessionId + 1, 1L, tUs, tUs)
              } else {
                st = st.copy(nEvents = st.nEvents + 1, endUs = tUs)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp((st.endUs + SessionGapUs) / 1000 + 1)
            out.result().iterator
          }
      }
  }

  val HourUs: Long = 3600L * 1000 * 1000

  final case class AsofOut(user_id: Long, event_id: Long, ts_us: Long,
                           last_click_us: Option[Long])

  /** Streaming as-of join — the streaming form of Events.evAsof: each
    * purchase emitted with the user's most recent click at-or-before
    * it. State per user is ONE timestamp (the latest click seen), so
    * state size is O(users) regardless of history — the same
    * carry-forward the batch window pass does, kept incrementally.
    * Rows are processed in (ts, click-before-purchase) order within
    * each micro-batch; correctness across batches holds for in-order
    * arrival (out-of-order clicks older than an already-emitted
    * purchase cannot retroactively change it — the inherent streaming
    * as-of caveat, bounded by the source's disorder). */
  def asofClicks(events: Dataset[SEvent]): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[Long]) =>
          // clicks sort before purchases at equal ts: at-or-before
          val sorted = rows.toArray.sortBy(e =>
            (e.ts_us, if (e.event_type == "click") 0 else 1, e.event_id))
          var lastClick = state.getOption
          val out = Seq.newBuilder[AsofOut]
          sorted.foreach { e =>
            if (e.event_type == "click") lastClick = Some(e.ts_us)
            else out += AsofOut(userId, e.event_id, e.ts_us, lastClick)
          }
          lastClick.foreach(state.update)
          out.result().iterator
      }
  }

  /** Stream-stream interval join — the streaming form of the banded
    * range join (Events.evRecentClicks' candidate stage): each purchase
    * paired with the same user's clicks in the preceding hour. The
    * COARSE time-interval condition on the watermarked ms-precision
    * timestamps is what lets Spark expire join state (each side holds
    * ≤ watermark + interval of history); the EXACT window is then
    * enforced on the microsecond epoch columns, so results match the
    * batch operator bit-for-bit despite the ms watermark granularity. */
  def recentClickPairs(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("ts_us").as("c_ts_us"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("ts_us"))
      .withWatermark("ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR 1 SECOND") &&
        col("c_ts") <= col("ts") &&
        col("c_ts_us") >= col("ts_us") - HourUs &&
        col("c_ts_us") < col("ts_us"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("c_ts_us"))
  }

  /** Stream-stream LEFT OUTER interval join — the join mode
    * [[recentClickPairs]] (inner) leaves open: every purchase emits,
    * null-extended when no qualifying click exists. The outer side is
    * WATERMARK-DRIVEN: a purchase can only be proven matchless once
    * the global watermark moves past its join horizon (no click that
    * could still arrive can fall in its window), so null-extended rows
    * surface one watermark advance later than matches — the spec pins
    * that timing. Same coarse-interval-for-state-expiry /
    * exact-microsecond-window split as the inner join: each side holds
    * ≤ watermark + interval of history, and results match the batch
    * left-outer formulation exactly. */
  def recentClickPairsOuter(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("ts_us").as("c_ts_us"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("ts_us"))
      .withWatermark("ts", "2 hours")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR 1 SECOND") &&
        col("c_ts") <= col("ts") &&
        col("c_ts_us") >= col("ts_us") - HourUs &&
        col("c_ts_us") < col("ts_us"),
      "leftOuter")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("c_ts_us"))
  }

  final case class FunnelState(lastViewUs: Long, lastQClickUs: Long)
  final case class FunnelOut(user_id: Long, event_id: Long, ts_us: Long,
                             converted: Boolean)

  /** Streaming ordered funnel (view → click → purchase) — the streaming
    * form of Events.evFunnel: per-user state is exactly TWO timestamps
    * (last view, last view-qualified click), the same carry-forward the
    * batch window pass computes, so state is O(users) however long the
    * history. Emits one row per purchase with its conversion flag.
    * In-order caveat as [[asofClicks]]. */
  def funnel(events: Dataset[SEvent]): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageOf = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .filter(e => stageOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[FunnelState]) =>
          val sorted = rows.toArray
            .sortBy(e => (e.ts_us, stageOf(e.event_type), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L))
          val out = Seq.newBuilder[FunnelOut]
          sorted.foreach { e =>
            e.event_type match {
              case "view" => st = st.copy(lastViewUs = e.ts_us)
              case "click" =>
                if (st.lastViewUs >= 0) st = st.copy(lastQClickUs = e.ts_us)
              case _ =>
                out += FunnelOut(userId, e.event_id, e.ts_us,
                  st.lastQClickUs >= 0)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  val FunnelWindowUs: Long = 86400L * 1000 * 1000 // 1 day

  /** Streaming TIME-BOUNDED funnel — the streaming form of
    * Events.evFunnelWindowed: identical two-timestamp state as
    * [[funnel]], with the [[FunnelWindowUs]] recency bound applied at
    * each stage transition (a click only refreshes the qualified-click
    * carry when the last view is ≤ 1 day old; a purchase only converts
    * when the carried qualified click is). The bound needs NO extra
    * state — staleness is checked against the event being processed,
    * exactly as the batch window pass does — so state stays O(users)
    * over any history. */
  def funnelWindowed(events: Dataset[SEvent]): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageOf = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .filter(e => stageOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[FunnelState]) =>
          val sorted = rows.toArray
            .sortBy(e => (e.ts_us, stageOf(e.event_type), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L))
          val out = Seq.newBuilder[FunnelOut]
          sorted.foreach { e =>
            e.event_type match {
              case "view" => st = st.copy(lastViewUs = e.ts_us)
              case "click" =>
                if (st.lastViewUs >= 0 &&
                  e.ts_us - st.lastViewUs <= FunnelWindowUs)
                  st = st.copy(lastQClickUs = e.ts_us)
              case _ =>
                out += FunnelOut(userId, e.event_id, e.ts_us,
                  st.lastQClickUs >= 0 &&
                    e.ts_us - st.lastQClickUs <= FunnelWindowUs)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class SDoc(ts: java.sql.Timestamp, doc_id: Long, text: String,
                        lang: String)

  /** Streaming curation — the batch pipeline_filter's gate+dedup chain
    * on a document stream: the quality/language gates are stateless
    * narrow ops (identical expressions to the batch path, so the two
    * cannot drift), and exact dedup keys on the content hash with
    * dropDuplicatesWithinWatermark — state holds one hash per distinct
    * surviving document inside the watermark horizon, and a
    * re-ingested duplicate arriving later is dropped without any
    * corpus rescan. The admission decision is the same as
    * [[graft.operators.Pipeline.pipelineIngest]]'s exact screen, made
    * incrementally per micro-batch. */
  def curateDocs(docs: Dataset[SDoc]): DataFrame =
    graft.operators.Pipeline.gate(docs.toDF())
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("n_tokens"))

  final case class TopKOut(user_id: Long, event_id: Long, value: Double)

  /** Streaming per-key top-k — the streaming analogue of the native
    * batch [[graft.plans.TopKPerKey]] operator: per user, keep the k
    * highest-value events seen so far in mapGroupsWithState state (the
    * same bounded heap, k·(id,value) per key — state size independent
    * of stream length), re-emitting the current top-k each batch.
    * Ordering is total ((value desc, event_id) — ties at the boundary
    * resolve identically to the batch window lowering, which
    * StreamingSpec asserts against. */
  def runningTopKPerUser(events: Dataset[SEvent],
                         k: Int): Dataset[TopKOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Long, Double)], TopKOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent],
         state: GroupState[Seq[(Long, Double)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map(e => (e.event_id, e.value)))
            .sortBy { case (id, v) => (-v, id) }
            .take(k)
          state.update(merged)
          merged.iterator.map { case (id, v) => TopKOut(userId, id, v) }
      }
  }

  /** Running per-user event counts via mapGroupsWithState (update-mode
    * stateful aggregation with unbounded-by-design keyed state). */
  def runningUserCounts(events: Dataset[SEvent]): Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (userId, n)
      }
  }

  /** STREAMING CMS MAINTENANCE — the sketch family's streaming pair:
    * count-min cells update over an unbounded key stream as a
    * stateful aggregation whose state is BOUNDED BY CONSTRUCTION
    * (≤ D·W integer cells whatever the key cardinality or stream
    * length — the point of maintaining a sketch instead of exact
    * counts online). Cell increments are associative, so the final
    * cells equal the batch sketch over the union of all micro-batches
    * (spec-pinned against [[graft.operators.RelationalQueries
    * .cmsBuckets]]-derived batch cells); heavy-hitter estimates read
    * min-over-D cells at any point in the stream. */
  def cmsCellsStream(keys: Dataset[Long]): Dataset[(Int, Long, Long)] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.toDF("key")
      .select(explode(graft.operators.RelationalQueries
        .cmsBuckets(col("key"))).as("h"))
      .select(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .as[(Int, Long)]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Int, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (cell: (Int, Long), rows: Iterator[(Int, Long)],
         state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (cell._1, cell._2, n)
      }
  }

  /** Streaming document row. `n_chars` is the TABLE's weight column,
    * carried through the stream — the sampler must weight by the same
    * column batch [[graft.operators.Pipeline.pipelineSampleWeighted]]
    * reads, not re-derive it from `text` (a `length(text)` proxy would
    * silently break batch/stream parity if a generator ever counted
    * n_chars differently, e.g. codepoints vs bytes). */
  final case class SDocSrc(ts: java.sql.Timestamp, doc_id: Long,
                           text: String, source: String, n_chars: Long)

  final case class WSampleOut(source: String, doc_id: Long,
                              n_chars: Long, es_key: Double)

  /** STREAMING weighted sampling — the A-Res property that makes
    * Efraimidis–Spirakis the streaming-native sampler: because each
    * row's key is independent of every other row, a bounded per-key
    * state (the current top-k (es_key, doc_id, n_chars) triples per
    * source) is EXACTLY the weighted sample of everything seen so
    * far, no matter how the stream is batched or ordered. Keys are
    * the same deterministic md5-derived ln(u)/w as the batch
    * [[graft.operators.Pipeline.weightedSample]], so the final state
    * EQUALS the batch sample bit-for-bit (spec-pinned) — the
    * batch/streaming parity the curation gate already has. State is
    * O(k) per source; each update emits the source's current sample
    * (update-mode changelog). */
  def weightedSampleStream(docs: Dataset[SDocSrc], k: Int)
      : Dataset[WSampleOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.toDF()
      .withColumn("es_key",
        round(log((conv(substring(md5(concat(lit("wsample:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
          + lit(0.5d)) / lit(4294967296.0d))
          / col("n_chars"), 9))
      .select(col("source"), col("doc_id"), col("n_chars"), col("es_key"))
      .as[WSampleOut]
    keyed
      .groupByKey(_.source)
      .flatMapGroupsWithState[Seq[WSampleOut], WSampleOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[WSampleOut],
         state: GroupState[Seq[WSampleOut]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++ rows)
            .sortBy(r => (-r.es_key, r.doc_id)).take(k)
          state.update(merged)
          merged.iterator
      }
  }

  final case class CdcState(tsUs: Long, eventId: Long, value: Double)
  final case class CdcOut(user_id: Long, ts_us: Long, event_id: Long,
                          value: Double)

  /** CDC LAST-WRITE-WINS dimension maintenance — the streaming
    * counterpart of the batch MERGE ([[graft.operators.Pipeline
    * .pipelineUpsert]]): keyed state holds each key's CURRENT value
    * as (ts_us, event_id, value), every micro-batch folds its rows
    * into that state by (ts_us, event_id) recency — so OUT-OF-ORDER
    * arrivals can never regress a newer value, the property a naive
    * overwrite-per-row CDC apply silently violates — and each update
    * emits the key's new current row (update-mode changelog). State
    * is O(1) per key; at scale this is exactly the state-store shape
    * a streaming materialized dimension keeps. */
  def cdcLatest(events: Dataset[SEvent]): Dataset[CdcOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcOut](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SEvent], state: GroupState[CdcState]) =>
          val init = state.getOption
            .getOrElse(CdcState(Long.MinValue, Long.MinValue, 0.0))
          val best = rows.foldLeft(init) { (b, e) =>
            if (e.ts_us > b.tsUs ||
              (e.ts_us == b.tsUs && e.event_id > b.eventId))
              CdcState(e.ts_us, e.event_id, e.value)
            else b
          }
          state.update(best)
          CdcOut(uid, best.tsUs, best.eventId, best.value)
      }
  }

  /** Welford running-moments state — NOT private: mGWS state classes
    * must be codegen-accessible (constructor called from generated
    * code). */
  final case class MomState(n: Long, mean: Double, m2: Double)

  final case class MomOut(user_id: Long, n: Long, mean: Double,
                          var_samp: Double)

  /** Per-user running moments (count / mean / sample variance) via
    * WELFORD's single-pass update inside mapGroupsWithState — the
    * streaming counterpart of ev_anomaly's batch moments, and the state
    * shape an online z-score monitor needs: O(1) doubles per user
    * regardless of stream length, numerically stable (no sum-of-squares
    * catastrophic cancellation). Emits the updated moments per
    * micro-batch (update mode); StreamingSpec asserts the final state
    * equals the batch avg/var_samp. */
  def runningUserMoments(events: Dataset[SEvent]): Dataset[MomOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[MomState, MomOut](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SEvent], state: GroupState[MomState]) =>
          var s = state.getOption.getOrElse(MomState(0L, 0.0, 0.0))
          rows.foreach { e =>
            val n1 = s.n + 1
            val d = e.value - s.mean
            val mean1 = s.mean + d / n1
            s = MomState(n1, mean1, s.m2 + d * (e.value - mean1))
          }
          state.update(s)
          MomOut(userId, s.n, s.mean,
            if (s.n > 1) s.m2 / (s.n - 1) else 0.0)
      }
  }

  /** Newly arriving vector for the streaming index ingest — the same
    * (id, embedding, label) shape as a row of the embeddings table. */
  final case class SVecIn(vec_id: Long, embedding: Seq[Float], label: Int)

  /** STREAMING ANN INGEST — the persisted index family's streaming
    * parity pair: new vectors arrive on an unbounded source and are
    * folded into the index's `codes_delta` segment micro-batch by
    * micro-batch. `foreachBatch` is the right tool (not a stateful
    * operator): the encode is a DETERMINISTIC per-row map whose only
    * "state" is the artifact's FROZEN quantizers (read once, driver
    * side, k·d + PqM·PqKsub doubles — never re-derived on ingest,
    * exactly the batch append's rule), so each micro-batch encodes
    * independently and APPENDS its cell-partitioned codes; the segment
    * after N micro-batches equals one batch append of the union
    * (StreamingSpec pins this against [[graft.operators.AnnIndex
    * .ensureDelta]]'s segment, bit for bit). Append-mode parquet into
    * the hive-partitioned segment keeps the search path's partition
    * pruning intact; a real deployment would compact small files with
    * [[graft.operators.AnnIndex.annIndexCompact]]'s re-layout.
    *
    * Layout guard (the mirror of [[graft.operators.AnnIndex
    * .ensureDelta]]'s stream-layout refusal): if `codes_delta` already
    * exists in the BATCH layout (root `_SUCCESS`), this writer throws
    * instead of growing `batch_id=*` subtrees under it — the mixed
    * directory either breaks Spark partition discovery ("conflicting
    * directory structures") or silently mis-reads; compaction is the
    * sanctioned transition between the two layouts.
    *
    * Replay/restart contract: the writer pins its checkpoint to a
    * DURABLE per-index location ([[annCheckpoint]]), so the batchId
    * numbering that keys the overwrite-idempotent subtrees survives
    * restarts — a second ingest session against the same index RESUMES
    * the lineage instead of restarting at batchId 0 and clobbering the
    * first session's `batch_id=0` subtree. Overriding the checkpoint
    * (`.option("checkpointLocation", …)` after this returns, as the
    * replay-simulation specs do) abandons that protection: a fresh
    * lineage restarts numbering at 0 and its overwrites DESTROY the
    * earlier session's same-numbered batches. */
  def annIngestStream(vecs: Dataset[SVecIn], indexPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[SVecIn] = {
    val spark = vecs.sparkSession
    requireStreamableSegment(spark, indexPath, "codes_delta")
    val cents = graft.operators.AnnIndex.readCents(spark, indexPath)
    val cb = graft.operators.AnnIndex.readCodebook(spark, indexPath)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", annCheckpoint(indexPath, "ingest"))
      .foreachBatch { (batch: Dataset[SVecIn], batchId: Long) =>
        val rows = batch.toDF()
          .select(col("vec_id"),
            graft.functions.VectorFunctions.toDoubleVec(col("embedding"))
              .as("v"),
            col("label"))
        // batchId-keyed OVERWRITE, not a segment-root append: foreachBatch
        // is at-least-once, so a recovered micro-batch REPLAYS with the
        // same batchId — rewriting its own batch_id=<id> subtree is a
        // no-op the second time, where a blind append would duplicate
        // every code row (round-7 advice). Readers treat batch_id as
        // ingest bookkeeping (AnnIndex.readSegment drops it); inside
        // the batch the rows take the same bucketed layout as the
        // batch-written segments (dirs = cell % CellBuckets, files
        // sorted by cell — writeCellBucketed's rationale): a micro-
        // batch touching a thousand cells writes ≤ CellBuckets dirs,
        // not a thousand, and cell pruning still reaches bucket dirs
        // plus row-group stats.
        graft.sources.ParquetSink.writeCellBucketed(
          graft.operators.AnnIndex.encode(rows, cents, cb),
          s"$indexPath/codes_delta/batch_id=$batchId",
          sortCols = Seq("vec_id"))
        ()
      }
  }

  /** Durable per-index checkpoint root for the streaming index
    * writers: keyed by the artifact path itself, so every session
    * against the same index shares one query lineage (and thus one
    * batchId sequence — the premise the batchId-keyed
    * overwrite-idempotence rests on). "_"-prefixed like the segment
    * markers, so parquet/partition discovery under the index root
    * skips it. */
  private[graft] def annCheckpoint(indexPath: String, kind: String): String =
    s"$indexPath/_checkpoints/$kind"

  /** Throw unless `seg` is absent or already stream-produced: growing
    * `batch_id=*` subtrees under a BATCH-written segment root (root
    * `_SUCCESS` + `cluster=*`/files at the root) makes a directory
    * neither reader layout parses — the one-directional round-8 guard
    * ([[graft.operators.AnnIndex.ensureDelta]] refusing stream-grown
    * segments) mirrored to the stream side. */
  private def requireStreamableSegment(spark: SparkSession,
                                       indexPath: String,
                                       seg: String): Unit =
    if (graft.operators.AnnIndex.committed(spark, indexPath, seg))
      throw new IllegalStateException(
        s"$seg under $indexPath was written by the batch path (root " +
          "_SUCCESS layout); streaming batch_id=* subtrees into it " +
          "would produce a mixed directory neither layout reads — " +
          "compactInPlace first or use a fresh artifacts root")

  /** STREAMING ANN QUERY SERVING — the query side of the index's
    * streaming story (ingest and deletes already stream): search
    * requests arrive as vectors on an unbounded source and every
    * micro-batch runs the SAME segment-complete ADC search plan the
    * batch queries are oracle-gated on ([[graft.operators.AnnIndex
    * .searchSegmentsFor]] — probe-cell pruning over base ∪ delta,
    * live-docs subtraction, broadcast per-query LUTs, native top-k
    * heap cut), appending per-query rankings to `outPath`. Per batch
    * the index side reads only the probed cell partitions — the
    * serving cost scales with the query batch, not the index. Empty
    * micro-batches write nothing. */
  def annServeStream(queries: Dataset[SVecIn], indexPath: String,
                     outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[SVecIn] =
    queries.writeStream
      .outputMode("append")
      // durable lineage keyed by the RESULT path (one serving run per
      // output dir), same restart contract as annIngestStream
      .option("checkpointLocation", annCheckpoint(outPath, "serve"))
      .foreachBatch { (batch: Dataset[SVecIn], batchId: Long) =>
        val qs = batch.toDF()
          .select(col("vec_id").as("query_id"),
            graft.functions.VectorFunctions.toDoubleVec(col("embedding"))
              .as("qv"))
        // batchId-keyed overwrite (the annIngestStream replay rule): a
        // recovered batch re-serves into its own subtree instead of
        // appending duplicate result rows
        if (!qs.isEmpty)
          graft.operators.AnnIndex
            .searchSegmentsFor(qs, indexPath, labelFiltered = false)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }

  /** STREAMING TOMBSTONE INGEST — the delete side of
    * [[annIngestStream]]: delete requests arrive as bare vector ids
    * and each micro-batch APPENDS them to the index's `deletes/`
    * artifact (Lucene .liv shape — a delete writes ids, never touches
    * a code segment, so the stream commits in O(batch) regardless of
    * index size). Readers pick the tombstones up on their next scan
    * via [[graft.operators.AnnIndex.minusDeletes]]'s committed-marker
    * check; the next compaction reclaims the space. Same layout guard
    * and durable-checkpoint contract as [[annIngestStream]]. */
  def annDeleteStream(ids: Dataset[Long], indexPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Long] = {
    requireStreamableSegment(ids.sparkSession, indexPath, "deletes")
    ids.writeStream
      .outputMode("append")
      .option("checkpointLocation", annCheckpoint(indexPath, "delete"))
      .foreachBatch { (batch: Dataset[Long], batchId: Long) =>
        // batchId-keyed overwrite — same replay-idempotence rule as
        // annIngestStream; a replayed delete batch rewrites itself
        // instead of doubling its tombstones (readers additionally
        // dedup on vec_id, so even cross-batch repeats can't fan out
        // the stats joins)
        batch.toDF("vec_id").coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$indexPath/deletes/batch_id=$batchId")
        ()
      }
  }

  /** Driver-held mini-batch k-means state for [[kmeansUpdateStream]]:
    * the current centers and the accumulated per-center mass. Updated
    * only inside foreachBatch (driver-side, serial per micro-batch),
    * read by the caller after the stream stops. */
  final class KMeansStreamState(@volatile var cents: Array[Array[Double]],
                                val counts: Array[Long])

  /** STREAMING MINI-BATCH K-MEANS — the online form of
    * [[graft.operators.KMeansQueries.kmeansMiniBatch]] (the
    * StreamingKMeans idea re-expressed over Structured Streaming):
    * every micro-batch of arriving vectors is one Sculley blend step,
    * executed by the SAME [[graft.operators.KMeansQueries
    * .miniBatchRound]] the batch query runs — assignment against the
    * current centers as plan literals, one k·d partial/final
    * aggregate, a k-row collect, 6dp quantization. State is the k·d
    * center matrix + k counts on the DRIVER (foreachBatch runs
    * serially there), never in executor state stores — the model is
    * tiny, the data is not. Stream == batch whenever the micro-batch
    * boundaries equal the batch round slices (spec-pinned). */
  def kmeansUpdateStream(vecs: Dataset[SVecIn], state: KMeansStreamState)
      : org.apache.spark.sql.streaming.DataStreamWriter[SVecIn] =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SVecIn], _: Long) =>
        val rows = batch.toDF()
          .select(col("vec_id"),
            graft.functions.VectorFunctions.toDoubleVec(col("embedding"))
              .as("v"))
        state.cents = graft.operators.KMeansQueries
          .miniBatchRound(rows, state.cents, state.counts)
        ()
      }

  /** Incoming document for the streaming quality scorer — the
    * (doc_id, text, lang) shape the trained model's feature
    * projection reads. */
  final case class SDocQ(doc_id: Long, text: String, lang: String)

  /** STREAMING MODEL SERVING — score documents arriving on an
    * unbounded source with a BATCH-TRAINED weight vector (the
    * train-offline / serve-online split every production quality
    * filter runs): the weights are plan literals, the scoring is the
    * exact stateless projection batch inference uses
    * ([[graft.operators.TextAnalysis.scoreWithWeights]] — narrow ops
    * only, so the same code lifts to the stream unchanged), and
    * because no state or watermark is involved, stream output ==
    * batch output row-for-row regardless of micro-batching
    * (spec-pinned). */
  def qualityScoreStream(docs: Dataset[SDocQ],
                         weights: Array[Double]): DataFrame =
    graft.operators.TextAnalysis.scoreWithWeights(docs.toDF(), weights)

  /** STREAMING FEATURE HASHING — the hashing trick's defining virtue
    * made concrete: because NO vocabulary/fit step exists, the
    * featurizer needs no model join, no state store and no watermark —
    * each arriving document's fixed-width bucket vector is a pure
    * function of its own tokens, computed by the VERBATIM batch core
    * ([[graft.operators.TextAnalysis.hashingVecOf]]) inside
    * foreachBatch. Stream == batch row-for-row across arbitrary
    * micro-batch splits (spec-pinned) — the property a dictionary-
    * based featurizer (tf-idf) structurally cannot have, since its
    * vocabulary depends on the whole corpus. */
  def hashingVecStream(docs: Dataset[SDocQ])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SDocQ] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SDocQ], _: Long) =>
        onBatch(graft.operators.TextAnalysis.hashingVecOf(batch.toDF()))
        ()
      }

  /** STREAMING NB LANGUAGE-ID SERVING — the trained Naive-Bayes
    * family's streaming counterpart (train-offline / serve-online,
    * like [[qualityScoreStream]] for the logreg model): documents
    * arrive on an unbounded source and each micro-batch is scored
    * under the BATCH-TRAINED `(lp, stats)` model from
    * [[graft.operators.TextAnalysis.nbModelOf]]. Unlike the logreg
    * scorer the NB model is VOCAB-SIZED — not a literal weight vector
    * — so per-doc scoring needs the model join and a per-doc argmax;
    * `foreachBatch` is the right tool (the annIngestStream rule):
    * inside it each micro-batch is a batch plan, so the scoring is
    * LITERALLY the batch scorer
    * ([[graft.operators.TextAnalysis.scoreWithNbModel]]) — stream ==
    * batch row-for-row across arbitrary micro-batch splits
    * (spec-pinned). Callers should persist `lp`/`stats` so the model
    * isn't re-derived per micro-batch. */
  def langIdServeStream(docs: Dataset[SDocQ], lp: DataFrame,
                        stats: DataFrame)(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SDocQ] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SDocQ], _: Long) =>
        onBatch(graft.operators.TextAnalysis
          .scoreWithNbModel(batch.toDF(), lp, stats))
        ()
      }

  /** STREAMING EMBEDDING DRIFT MONITOR — the live side of
    * [[graft.operators.Similarity.annCellDrift]]: arriving vectors
    * quantize onto the FROZEN deployed cells (plan literals, the O5
    * pattern — the monitor never refits, so it measures the data,
    * not itself) and a stateful streaming aggregation maintains the
    * running per-cell counts. State is ≤ k rows — independent of
    * stream length, the smallest state any running histogram can
    * carry — and each micro-batch's update emits only the cells it
    * touched (update mode). Comparing the emitted counts against the
    * frozen base's shares is a k-row batch join the consumer does at
    * read time; StreamingSpec pins the running counts equal to the
    * batch monitor's on the same corpus slice across arbitrary
    * micro-batch splits. */
  def cellDriftStream(vecs: Dataset[SVecIn],
                      cents: Array[Array[Double]]): DataFrame =
    graft.kmeans.KMeansOps.assignDyn(
      vecs.toDF().select(
        graft.functions.VectorFunctions.toDoubleVec(col("embedding"))
          .as("v")),
      "v", cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_new"))

  /** STREAMING CROSS-CORPUS DEDUP SCREEN — the production ingest
    * shape of [[graft.operators.Dedup.dedupCrossCorpus]]: the curated
    * base's banded signatures + shingle sets are PRECOMPUTED
    * artifacts ([[graft.operators.Dedup.baseScreenArtifacts]],
    * persisted by the caller — the base is read zero times per
    * batch), and each arriving micro-batch of crawl documents pays
    * crawl-side compute only: its own shingles + signatures, the
    * (band, sig) candidate equi-join against the static base, exact
    * Jaccard on candidates. foreachBatch is the right tool (the
    * annIngestStream rule): inside it the screen is LITERALLY the
    * batch screen, so stream == batch pair-for-pair across arbitrary
    * micro-batch splits (spec-pinned against `dedup_cross_corpus`
    * on the same corpus split). Stateless per batch — a crawl doc is
    * screened in the batch it arrives with; no watermark or state
    * store involved, so throughput is the batch join's. */
  def crossCorpusScreenStream(docs: Dataset[SDocQ], baseSig: DataFrame,
                              baseSh: DataFrame)(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SDocQ] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SDocQ], _: Long) =>
        onBatch(graft.operators.Dedup
          .screenAgainstBase(batch.toDF(), baseSig, baseSh))
        ()
      }

  /** Arriving crawl document (text side of the admission gate). */
  final case class SCrawlDoc(doc_id: Long, text: String)

  /** Arriving crawl URL (host side of the admission gate). */
  final case class SHost(doc_id: Long, host: String)

  /** STREAMING URL-BLOCKLIST GATE — the
    * [[graft.operators.Pipeline.urlFilterOf]] suffix-chain filter per
    * micro-batch: stateless (a host's verdict depends on nothing but
    * the host and the static blocklist), so foreachBatch runs
    * LITERALLY the batch operator — suffix explode, broadcast equi
    * join, per-doc min — and stream == batch row-for-row across any
    * micro-batch split. The crawl-frontier shape: filter URLs as they
    * are discovered, before any fetch happens. */
  def urlFilterStream(hosts: Dataset[SHost], blocklist: Seq[String])
                     (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SHost] =
    hosts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SHost], _: Long) =>
        onBatch(graft.operators.Pipeline.urlFilterOf(batch.toDF(), blocklist))
        ()
      }

  /** Arriving crawl document with its host (quota-admission input). */
  final case class SHostDoc(doc_id: Long, host: String)

  /** Quota-admission verdict: running per-host arrival ordinal and
    * whether the doc made it under the cap. */
  final case class QuotaOut(doc_id: Long, host: String, admitted: Boolean,
                            host_seen: Long)

  /** STREAMING HOST-QUOTA ADMISSION — the ONLINE form of the batch
    * [[graft.operators.Pipeline.pipelineDomainCap]]: where the offline
    * op keeps each host's top-scored docs (it sees the whole corpus),
    * the crawl frontier must decide AT ARRIVAL, so the online rule is
    * first-come admission — each host's first `cap` documents pass,
    * the rest are marked refused (a crawler stops fetching the host
    * entirely once over quota). State is ONE Long per host
    * (mapGroupsWithState's O(keys) rule — the admission counter),
    * bounded regardless of how many docs a hot host floods in: the
    * skew case the cap exists for is exactly the case the state does
    * NOT grow with. Within a micro-batch, docs apply in doc_id order
    * so a replayed batch admits identically (the exactly-once rule);
    * across batches, admission order IS arrival order — the online
    * semantics, not a deficiency. */
  def hostQuotaStream(docs: Dataset[SHostDoc], cap: Int)
      : Dataset[QuotaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.host)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[SHostDoc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(_.doc_id).map { d =>
            n += 1
            QuotaOut(d.doc_id, host, n <= cap, n)
          }
          state.update(n)
          out.iterator
      }
  }

  /** Arriving frontier URL (robots-gate input). */
  final case class SUrl(doc_id: Long, host: String, path: String)

  /** STREAMING ROBOTS GATE — the frontier form of
    * [[graft.operators.Pipeline.pipelineRobots]]: the parsed rules
    * relation ([[graft.operators.Pipeline.parseRobotsRelation]]) is
    * the PRECOMPUTED artifact (robots corpora change slowly; real
    * crawlers cache them) — each arriving micro-batch of discovered
    * URLs pays one broadcast prefix join + per-doc argmax. Stateless
    * per batch, so stream == batch under any split. Completes the
    * frontier trio with [[urlFilterStream]] (blocklist) and
    * [[hostQuotaStream]] (quota). */
  def robotsStream(urls: Dataset[SUrl], parsed: DataFrame)
                  (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SUrl] =
    urls.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SUrl], _: Long) =>
        onBatch(graft.operators.Pipeline
          .robotsVerdicts(batch.toDF(), parsed))
        ()
      }

  /** STREAMING DSIR SCORING — the serving form of
    * [[graft.operators.Pipeline.pipelineDsir]]: the log-ratio bucket
    * distribution is the PRECOMPUTED artifact
    * ([[graft.operators.Pipeline.dsirRatio]], persisted per target
    * domain by the caller); each arriving micro-batch pays one token
    * explode + one (doc,bucket) agg + the 32-row broadcast join.
    * Stateless per batch — a doc's score depends only on itself and
    * the frozen artifact — so stream == batch across any split. This
    * is how DSIR actually deploys: distributions fitted offline once,
    * crawl scored at ingest. */
  def dsirScoreStream(docs: Dataset[SCrawlDoc], ratio: DataFrame)
                     (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SCrawlDoc] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SCrawlDoc], _: Long) =>
        onBatch(graft.operators.Pipeline
          .dsirScoreAgainst(batch.toDF(), ratio))
        ()
      }

  /** STREAMING PARAGRAPH SCREEN — the ingest form of
    * [[graft.operators.Dedup.paragraphScreenAgainstBase]]: the curated
    * base's distinct segment hashes are a PRECOMPUTED artifact
    * ([[graft.operators.Dedup.baseParagraphHashes]], persisted by the
    * caller — the base is read zero times per batch); each arriving
    * micro-batch pays its own segmentation plus one equi join against
    * the static hash set, and docs are rebuilt from their unseen
    * prose. Stateless per batch (the [[crossCorpusScreenStream]]
    * rule), so stream == batch across arbitrary splits. */
  def paragraphScreenStream(docs: Dataset[SCrawlDoc], baseHashes: DataFrame)
                           (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SCrawlDoc] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SCrawlDoc], _: Long) =>
        onBatch(graft.operators.Dedup
          .paragraphScreenAgainstBase(batch.toDF(), baseHashes))
        ()
      }

  /** Stream row for the image screen: arriving image ids (the blob is
    * synthesized in-batch from the id by the same column expression
    * the batch corpus uses — a real deployment would carry the binary
    * column itself; the decode/hash path is identical either way). */
  final case class SImg(doc_id: Long)

  /** STREAMING CROSS-CORPUS IMAGE SCREEN — the
    * [[crossCorpusScreenStream]] shape for the perceptual-hash family:
    * the curated base's (geometry, hash) buckets are a PRECOMPUTED
    * artifact ([[graft.operators.Multimodal.imageBaseBuckets]],
    * persisted by the caller); each arriving micro-batch pays its own
    * decode + hash and ONE equi-join against the static buckets.
    * foreachBatch wraps the literal batch screen, so stream == batch
    * flag-for-flag across arbitrary micro-batch splits. Stateless per
    * batch — no watermark, no state store. */
  def imageScreenStream(imgs: Dataset[SImg], baseBuckets: DataFrame)
      (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SImg] =
    imgs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SImg], _: Long) =>
        onBatch(graft.operators.Multimodal
          .screenImagesAgainstBase(batch.toDF(), baseBuckets))
        ()
      }

  final case class SMedia(doc_id: Long, blob: Array[Byte])

  /** STREAMING VAD — codec work under readStream: each arriving
    * micro-batch of raw media blobs pays ONE mapPartitions
    * decode+segmentation pass through the batch kernel
    * ([[graft.operators.Multimodal.WavVadOp]]), so the
    * codec-at-scan-speed rule holds unchanged under streaming — no
    * shuffle, no state store, no watermark; stream == batch
    * row-for-row across arbitrary micro-batch splits. Blobs the
    * decoder rejects drop from the relation, never poison the
    * stream. */
  def vadStream(media: Dataset[SMedia])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SMedia] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SMedia], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(batch.mapPartitions(_.flatMap(m =>
          graft.operators.Multimodal.WavVadOp.vad(m.doc_id, m.blob)))
          .toDF())
        ()
      }

  /** STREAMING TAR INGEST — WebDataset shards under readStream: each
    * arriving micro-batch of archive blobs pays ONE mapPartitions
    * walk through the batch kernel
    * ([[graft.operators.Archives.tarMembersOf]]): header checksums,
    * typeflag dispatch, member extraction — stateless, no shuffle,
    * no state store; stream == batch member-for-member across
    * arbitrary micro-batch splits, and a corrupt archive drops
    * whole (never emits partial member lists). */
  def tarIngestStream(media: Dataset[SMedia])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SMedia] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SMedia], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(graft.operators.Archives.tarMembersOf(
          batch.map(m =>
            graft.operators.Multimodal.MediaRow(m.doc_id, m.blob))).toDF())
        ()
      }

  /** STREAMING WARC INGEST — web-crawl files under readStream: each
    * arriving micro-batch of WARC blobs pays ONE mapPartitions walk
    * through the batch kernel ([[graft.operators.Warc.warcInfoOf]]):
    * version/header grammar, Content-Length-exact content blocks,
    * record separators, non-response skipping — stateless, no
    * shuffle, no state store; stream == batch row-for-row across
    * arbitrary micro-batch splits, and a corrupt crawl file drops
    * whole (never emits a partial record list). */
  def warcIngestStream(media: Dataset[SMedia])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SMedia] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SMedia], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(graft.operators.Warc.warcInfoOf(
          batch.map(m =>
            graft.operators.Multimodal.MediaRow(m.doc_id, m.blob))).toDF())
        ()
      }

  /** STREAMING CRAWL TEXT EXTRACTION — the three-layer unwrap (WARC
    * walk → HTTP parse → HTML strip) under readStream: each arriving
    * micro-batch of crawl files pays ONE mapPartitions pass through
    * the batch kernels ([[graft.operators.Warc.decodeWarcPayloads]] ∘
    * `parseHttp` ∘ `htmlToText`) — stateless, no shuffle; stream ==
    * batch row-for-row across arbitrary micro-batch splits, and a
    * malformed layer drops the file whole. */
  def crawlExtractStream(media: Dataset[SMedia])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SMedia] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SMedia], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(batch.mapPartitions(_.flatMap { m =>
          import graft.operators.Warc
          for {
            rs <- Warc.decodeWarcPayloads(m.blob).toSeq
            (_, payload) <- rs
            http <- Warc.parseHttp(payload)
            text <- Warc.htmlToText(new String(http.body, "UTF-8"))
          } yield (m.doc_id, text)
        }).toDF("doc_id", "text_out"))
        ()
      }

  /** STREAMING MULTI-FORMAT DISPATCH — the [[vadStream]] rule for a
    * MIXED-format blob stream: each micro-batch pays one magic-
    * dispatch decode pass through the batch core
    * ([[graft.operators.Multimodal.dispatchDecode]]) — four real
    * decoders behind one dispatch, stateless, no shuffle; stream ==
    * batch row-for-row across splits, unrecognized blobs drop. */
  def dispatchStream(media: Dataset[SMedia])(onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[SMedia] =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SMedia], _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        onBatch(graft.operators.Multimodal.dispatchDecode(
          batch.map(m =>
            graft.operators.Multimodal.MediaRow(m.doc_id, m.blob))).toDF())
        ()
      }

  /** STREAMING SNAPSHOT INGEST — exactly-once transactional append
    * into an Iceberg-lite [[graft.sources.SnapshotTable]]: each
    * micro-batch becomes ONE atomically-published table version via
    * [[graft.sources.SnapshotTable.commitBatch]], whose batchId-keyed
    * data-dir naming turns foreachBatch's at-least-once replay into a
    * detected no-op (the replay check reads the same
    * atomically-renamed manifest readers use — no sidecar state to
    * drift). Downstream batch readers get snapshot isolation over the
    * live stream for free: `readLatest` pins a manifest, so a query
    * running while the stream commits never sees a torn batch.
    * The checkpoint is pinned DURABLY under the table root
    * ([[annIngestStream]]'s rule): a second ingest session resumes
    * the batchId lineage, keeping replay detection sound across
    * restarts. Overriding it starts a fresh lineage whose batchIds
    * RESTART at 0 — commitBatch then REFUSES those as replays rather
    * than duplicating rows (data loss for the new session's first
    * batches, surfaced by the None return, never silent duplication).
    * Contract: this lineage must be the table's only append writer
    * (see commitBatch). Generic in the row type so any curated
    * stream — including the [[curateDocs]] gate's output — lands in
    * a versioned table. */
  def snapshotSinkStream[T](docs: Dataset[T], root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[T] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/_checkpoints/ingest")
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        graft.sources.SnapshotTable
          .commitBatch(batch.sparkSession, root, batch.toDF(), batchId)
        ()
      }

  /** STREAMING CDC UPSERT SINK — a change stream maintained as a
    * LATEST-PER-KEY snapshot table via exactly-once MERGE-ON-READ
    * upserts ([[graft.sources.SnapshotTable.upsertBatch]]): each
    * micro-batch commits one delete vector + one data set named by
    * its batchId, so an at-least-once replay is a detected no-op and
    * the table converges to the batch semantics of
    * latest-row-per-key — [[cdcLatest]]'s result, but DURABLE,
    * versioned, and constant-cost per batch against a table of any
    * size (the COW alternative rewrites matched partitions per
    * batch). Within a micro-batch carrying several rows for one key,
    * the LAST by (ts, id) wins — resolved BEFORE the commit with one
    * per-key max, the CDC compaction rule. */
  def morSinkStream(rows: Dataset[SEvent], root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[SEvent] =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/_checkpoints/cdc")
      .foreachBatch { (batch: Dataset[SEvent], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions._
        val latest = batch.toDF()
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts_us"), col("event_id"), col("value")))
            .as("m"))
          .select(col("user_id"), col("m.ts_us").as("ts_us"),
            col("m.event_id").as("event_id"), col("m.value").as("value"))
        if (!latest.isEmpty)
          graft.sources.SnapshotTable
            .upsertBatch(spark, root, latest, "user_id", batchId)
        ()
      }
}
