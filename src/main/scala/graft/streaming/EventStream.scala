package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming layer over event streams (engine extension — the
  * reference has no streaming surface at all, SURVEY.md §2.9).
  *
  * The batch queries in graft.queries.EventOps and these streaming versions
  * share semantics: an hourly tumbling-window count/sum, and gap-based
  * sessionization. Batch is `groupBy(window(...))`; streaming adds a
  * watermark for state eviction and runs incrementally.
  *
  * Scale notes: windowed aggregation state is partitioned by (window, key)
  * and evicted by the watermark, so state size is bounded by
  * (#keys x watermark/window-size), independent of stream length.
  * Sessionization keeps one state row per active user; `flatMapGroupsWithState`
  * emits sessions as they close (event-time timeout via the watermark).
  */
object EventStream {

  /** Schema of the events table (ts as TimestampType — streaming sources
    * deliver proper timestamps; the batch parquet's TIMESTAMP(NANOS) quirk
    * is a storage detail).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a directory of event parquet/json. */
  def readEvents(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** Hourly tumbling-window aggregation with a 1h watermark — streaming twin
    * of q_events_hourly.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("val_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("val_sum"))

  /** Hourly distinct users per event type as a streaming HLL sketch
    * aggregation — incremental `approx_count_distinct` over event-time
    * windows. Exact streaming COUNT(DISTINCT) would need unbounded
    * per-window key state; the sketch is a few KB per (window, type) no
    * matter the user cardinality, and the same binary sketches can be
    * sunk to a table and rolled up later (graft.ops.Sketches.rollup).
    */
  def hourlyDistinctUsers(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        hll_sketch_estimate(col("sketch")).as("approx_users"), col("sketch"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, lastMs: Long, nEvents: Long)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Gap-based sessionization (30-min inactivity) via flatMapGroupsWithState:
    * one state row per active user; sessions emit on gap or event-time
    * timeout. Streaming twin of q_sessionize.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.lastMs, s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = ms, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += Session(userId, s.start, s.lastMs, s.nEvents)
                  cur = Some(SessionState(ms, ms, 1))
                case None =>
                  cur = Some(SessionState(ms, ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream join: each error event joined to the same user's
    * purchases within the preceding `windowMinutes`. Both sides carry
    * watermarks so join state is evicted; the time-range predicate bounds
    * how long a purchase is buffered.
    *
    * The output carries BOTH sides' event ids (`event_id`, `p_event_id`),
    * so (event_id, p_event_id) is a true key of the result. That matters
    * downstream: streaming sinks are at-least-once (a batch replayed
    * after a failure between data commit and checkpoint commit is
    * delivered again), and a keyed output is what lets consumers dedupe
    * replays exactly — the same screen-on-a-key discipline
    * [[versionedSink]]'s docs prescribe for file sinks.
    */
  def errorsAfterPurchases(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("event_id"), col("p_event_id"), col("e_user").as("user_id"),
        col("e_ts"), col("p_ts"), col("purchase_value"))
  }

  /** LEFT-outer stream-stream interval join: every error event emits —
    * joined to the same user's purchases in the preceding `windowMinutes`
    * when any exist, with NULL purchase columns otherwise. The outer side
    * makes watermarking load-bearing in a way the inner join's isn't:
    * an unmatched error can only be declared unmatched (and its NULL row
    * emitted) once the watermark proves no qualifying purchase can still
    * arrive, so null rows surface one micro-batch AFTER the watermark
    * passes their window — callers replaying a finite backlog must ensure
    * the watermark advances past the data and at least one further batch
    * runs (a later-timestamped sentinel file under maxFilesPerTrigger
    * does it; see q_stream_left_join).
    *
    * Sentinels must SURVIVE THE FILTERS — one per side. Placing one
    * watermark on the shared source above the filters does NOT let a
    * neither-type sentinel advance it: Catalyst pushes the event_type
    * predicates through the EventTimeWatermark node into the parquet
    * scan, where row-group min/max stats skip a sentinel-only file
    * outright, so the watermark operator never sees the row (measured:
    * the sentinel batch reports numInputRows=0 and a null event-time
    * max). The watermark can only be driven by rows each side KEEPS, so
    * replay harnesses append a sentinel 'error' and a sentinel
    * 'purchase' under reserved keys that can never join, and drop those
    * keys after the sink.
    *
    * State scale: both sides evict by the interval bound + delay, so
    * state is O(events in the watermark horizon), independent of stream
    * length — same as the inner form.
    */
  def errorsLeftPurchases(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")
      .select(col("event_id"), col("p_event_id"), col("e_user").as("user_id"),
        col("e_ts"), col("p_ts"), col("purchase_value"))
  }

  /** [[errorsLeftPurchases]] with BOTH sides outer: every error emits
    * (with its preceding-window purchases or NULLs), and every purchase
    * that preceded no error within the window ALSO emits, with NULL
    * error columns — the full reconciliation view ("which purchases
    * never produced a follow-up error" is the side a left join cannot
    * answer). Same state contract, now symmetric: an unmatched row on
    * EITHER side may only emit once the watermark proves nothing on the
    * other side can still match it, so the staged-sentinel protocol in
    * the q_stream_left_join gate applies to both sides. `user_id` is
    * coalesced across the sides (exactly one is non-null on unmatched
    * rows); (event_id, p_event_id) remains a true output key — each
    * unmatched row carries its own side's unique id and NULL for the
    * other — so the keyed at-least-once replay screen still applies.
    */
  def errorsFullPurchases(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    errors.join(purchases,
      col("e_user") === col("p_user") &&
        col("p_ts") <= col("e_ts") &&
        col("p_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "full_outer")
      .select(col("event_id"), col("p_event_id"),
        coalesce(col("e_user"), col("p_user")).as("user_id"),
        col("e_ts"), col("p_ts"), col("purchase_value"))
  }

  /** Incremental HLL sketch store: every micro-batch appends its own
    * per-(hour, event_type) user sketch rows to `storePath` — "sketches as
    * incremental state". No streaming aggregation state or watermark is
    * involved because HLL union is associative: the append-only store IS
    * the state, and [[servedDistinctUsers]] answers any later rollup by
    * pure sketch union without rescanning raw events. At 100 TB this is
    * the pattern that keeps distinct-user serving O(groups × KB): the
    * stream writes KB-sized sketch rows, never raw ids, and re-aggregation
    * cost is proportional to the store, not the history.
    */
  def sketchStoreSink(events: DataFrame, storePath: String,
      checkpoint: String, lgK: Int = 12): StreamingQuery =
    // returns the LIVE query (await it like curateStream's) so multiple
    // sinks can run concurrently and callers keep a usable handle
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(storePath)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()

  /** Serve hourly-or-coarser distinct-user rollups from a [[sketchStoreSink]]
    * store by sketch union (graft.ops.Sketches.rollup): `keep` ⊆
    * (hour_start, event_type). Estimates are IDENTICAL to a batch
    * `hll_sketch_estimate(hll_sketch_agg(...))` at the same lgK — HLL union
    * is a lossless merge of the per-batch sketches. (NOT the same algorithm
    * as `approx_count_distinct`, which is Spark's relativeSD-parameterized
    * HLL++; StreamingSpec asserts against the sketch form.)
    */
  def servedDistinctUsers(spark: SparkSession, storePath: String,
      keep: Seq[String]): DataFrame =
    graft.ops.Sketches.rollup(spark.read.parquet(storePath), keep,
      estimateAs = "approx_users")

  /** Run a streaming DataFrame to a named in-memory sink until all source
    * data is processed (synchronous smoke path for tests/demos).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
