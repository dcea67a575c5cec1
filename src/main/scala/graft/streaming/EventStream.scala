package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine (SURVEY.md §2.15: the
  * reference "automates" by re-running batch jobs on an Airflow
  * interval; the native machinery for that intent is a file-source
  * stream + windowed aggregation + watermark). The same rollup exists
  * as batch query `e1_event_windows` — streaming and batch must agree,
  * which the verify gate checks end-to-end.
  *
  * Scale notes: tumbling-window counts are partial-aggregated per
  * micro-batch and stored in versioned state keyed by (window, type) —
  * state size is bounded by watermark retention, not input size.
  * Session state in [[userSessions]] is per-user and evicted on
  * timeout.
  */
object EventStream {

  /** events schema of the LEGACY fixture era, where ts was parquet
    * TIMESTAMP(NANOS) and had to be read as raw long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (current fixtures
    * store TIMESTAMP(MICROS); [[read]] dispatches on the actual files).
    * Kept for tests that synthesize nanos-encoded inputs.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** events schema of the CURRENT fixture era (ts = TIMESTAMP(MICROS));
    * the inference fallback in [[read]] when the ingestion directory is
    * still empty at stream start.
    */
  val microsSchema: StructType = StructType(
    rawSchema.map(f => if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** File-source stream over a directory of events parquet. Streaming
    * sources need an explicit schema; take it from the files already in
    * the directory (one batch footer read at plan time) so the `ts`
    * encoding dispatch in [[graft.core.Tables.normalizeTs]] tracks
    * whatever fixture era is on disk — MICROS (current), or legacy
    * NANOS-as-long under the legacy conf.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    // Inference throws AnalysisException on a directory with no parquet
    // files yet — the normal state of an ingestion dir at stream start.
    // Fall back to the era-appropriate explicit schema: legacy NANOS
    // fixtures only exist under the nanosAsLong conf, otherwise MICROS.
    val onDisk =
      try spark.read.parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          val legacyNanos = spark.conf
            .getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")
          if (legacyNanos) rawSchema else microsSchema
      }
    graft.core.Tables.normalizeTs(spark.readStream.schema(onDisk).parquet(dir))
  }

  /** Derived session whose `spark.sql.shuffle.partitions` is sized for
    * STREAMING STATE rather than batch shuffle width. A stateful query
    * creates one state-store instance per shuffle partition per
    * micro-batch, each paying open/commit/maintenance overhead every
    * batch — so the right partition count follows state VOLUME (keys
    * retained under the watermark), not core count. At local[32] the
    * tumbling rollup carries a few hundred (window, type) keys; 32
    * state stores is pure per-instance overhead (measured ~1.7 s vs
    * ~0.96 s at 8 partitions, DESIGN.md). On a 1000-executor cluster
    * the same dial goes UP for TB-scale state. Batch queries in the
    * parent session are unaffected: `newSession` shares the
    * SparkContext but owns its conf (builder configs are inherited,
    * runtime mutations are not).
    */
  def stateSizedSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    require(statePartitions > 0, s"statePartitions must be positive: $statePartitions")
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    s
  }

  /** Tumbling-window rollup; identical shape to the batch
    * `e1_event_windows` (hour_start, event_type, n_events, sum_value).
    */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drops re-delivered duplicates while only
    * keeping state for the watermark horizon — the bounded-state form
    * of exact dedup for continuous training-data ingestion (an
    * unbounded `dropDuplicates` would accumulate state forever).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join: each purchase is joined to the same
    * user's clicks in the preceding `before` interval. Both sides carry
    * watermarks AND the join condition bounds c_ts relative to p_ts, so
    * Spark can evict click-side state once the watermark passes the
    * interval — the state stays bounded by (watermark + interval) of
    * traffic, independent of stream length. Without the time-bound
    * predicate a stream-stream inner join would buffer one side forever.
    */
  def purchaseClickJoin(events: DataFrame, before: String = "10 minutes",
                        watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $before") &&
          col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("click_id"))
  }

  /** Run a streaming frame to completion against a memory sink and
    * return the materialized table (drives the whole micro-batch
    * machinery; used by the verify gate and tests).
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q: StreamingQuery = streamed.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** foreachBatch sink: the escape hatch for destinations Structured
    * Streaming lacks natively (JDBC upserts, multi-table fan-out). Each
    * micro-batch arrives as a plain DataFrame plus its replay-stable
    * batch id — idempotent writers key on it for exactly-once delivery
    * on restart (checkpoint replays the same id with the same data).
    */
  def runForeachBatch(streamed: DataFrame,
                      f: (DataFrame, Long) => Unit): Unit = {
    val q = streamed.writeStream.outputMode(OutputMode.Append())
      .foreachBatch(f).start()
    q.processAllAvailable()
    q.stop()
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class EwmaState(acc: Double, n: Long)
  final case class KeyedEwma(user_id: Long, n_obs: Long, ewma: Double)

  final case class FunnelState(stage: Int)
  final case class KeyedStage(user_id: Long, stage: Int)

  /** Streaming face of the batch funnel state machine
    * (operators.Sequences): the furthest-stage-reached integer lives in
    * keyed state, each micro-batch's slice is sorted by (micros,
    * event_id) and folded through the same greedy subsequence match.
    * Same ordering caveat as [[ewmaUpdates]]; emits one updated
    * (user_id, stage) row per key per batch (Update mode).
    */
  def funnelUpdates(events: DataFrame, steps: Seq[String]): org.apache.spark.sql.Dataset[KeyedStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stepsArr = steps.toIndexedSeq
    events.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, KeyedStage](GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[FunnelState]) =>
          var stage = state.getOption.map(_.stage).getOrElse(0)
          it.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
            if (stage < stepsArr.length && r._4 == stepsArr(stage)) stage += 1
          }
          state.update(FunnelState(stage))
          KeyedStage(uid, stage)
      }
  }

  /** Streaming face of the batch EWMA fold (operators.Ewma): per-user
    * recursive smoothing carried as (acc, n) in keyed state — O(1)
    * state per user, evicted never (the running statistic IS the
    * product). Each micro-batch's group slice is sorted by
    * (epoch-micros, event_id) before folding, so with time-ordered
    * arrival per key (the append-log norm) the stream equals the batch
    * fold exactly — the e7 gate proves it end-to-end against the same
    * DuckDB oracle as ts2. Out-of-order data ACROSS batches would need
    * the batch operator; within a batch it is handled by the sort.
    * Emits one updated (user_id, n_obs, ewma) row per key per batch
    * (Update output mode).
    */
  def ewmaUpdates(events: DataFrame, alpha: Double): org.apache.spark.sql.Dataset[KeyedEwma] = {
    val spark = events.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    events.filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[EwmaState, KeyedEwma](GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[EwmaState]) =>
          val rows = it.toArray.sortBy(r => (r._2, r._3))
          var (acc, n) = state.getOption.map(s => (s.acc, s.n)).getOrElse((0.0, 0L))
          rows.foreach { r =>
            acc = if (n == 0L) r._4 else acc * beta + r._4 * alpha
            n += 1
          }
          state.update(EwmaState(acc, n))
          KeyedEwma(uid, n, acc)
      }
  }
  final case class UserSession(user_id: Long, start_ms: Long, end_ms: Long,
                               n_events: Int, seconds: Double)

  /** Stateful sessionization: events within `gapMs` of each other merge
    * into one session per user. Sessions emit when a later event opens
    * a new session OR when the gap elapses with no event (event-time
    * timeout, so per-user state is actually evicted in a real stream —
    * the state-size bound DESIGN.md claims). Requires a watermark on
    * the event timestamp when run as a stream. Within a batch, events
    * are time-sorted; an event landing inside [start−gap, end+gap]
    * extends the current session in either direction, so bounded
    * out-of-order input can't produce end < start.
    */
  def userSessions(events: org.apache.spark.sql.Dataset[Event],
                   gapMs: Long): org.apache.spark.sql.Dataset[UserSession] = {
    import events.sparkSession.implicits._
    def close(uid: Long, s: SessionState): UserSession =
      UserSession(uid, s.start, s.end, s.n, (s.end - s.start) / 1e3)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (!it.hasNext && state.hasTimedOut) {
            // gap elapsed: emit the open session and evict state
            val out = state.getOption.map(close(uid, _)).iterator
            state.remove()
            out
          } else {
            val times = it.map(_.ts.getTime).toSeq.sorted
            var sessions = Vector.empty[UserSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  sessions :+= close(uid, s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fires once the watermark passes the session's gap edge
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            sessions.iterator
          }
      }
  }
}
