package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming seam over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). The reference has no
  * streaming surface (SURVEY.md §2.8) — this is north-star scope: the same
  * transformations exposed in batch form (oracle-checkable) and streaming
  * form (incremental, watermarked), sharing semantics.
  *
  * Scale notes: tumbling-window aggregation is a streaming hash aggregate
  * keyed on (window, event_type) — state size bounded by watermark
  * retention; sessionization state is one small record per active user,
  * dropped once the user is idle past `stateTtl` (event-time timeout);
  * streaming dedup state is bounded the same way via `ttl`. Both TTLs
  * are opt-in because expiry trades exactness for the bound — the
  * no-TTL forms stay exact on finite key domains.
  */
object EventsStream {

  /** Parse the TTL strings this module accepts ("90 seconds", "2 hours")
    * into millis — needed because timeout re-arms must be clamped against
    * the numeric watermark, which the string-based setTimeoutTimestamp
    * overload cannot do.
    */
  private val TtlPattern = """(?i)^\s*(\d+)\s*(second|minute|hour|day)s?\s*$""".r
  private def ttlMillis(s: String): Long = s match {
    case TtlPattern(n, u) =>
      val mult = u.toLowerCase(java.util.Locale.ROOT) match {
        case "second" => 1000L
        case "minute" => 60000L
        case "hour"   => 3600000L
        case "day"    => 86400000L
      }
      n.toLong * mult
    case _ => throw new IllegalArgumentException(
      s"unparseable TTL '$s' (use e.g. '30 minutes', '2 hours')")
  }

  /** Arm an event-time timeout at base+ttl, clamped above the current
    * watermark. GroupStateImpl rejects timestamps at or below the
    * watermark, so a duplicate arriving on live state whose base+ttl the
    * watermark has already passed would crash the query instead of being
    * dropped. Clamping to watermark+1 makes the group time out on the
    * next data-less batch — the intended best-effort expiry.
    */
  private[graft] def armTimeout(state: GroupState[_], baseMs: Long, ttlMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(baseMs + ttlMs, state.getCurrentWatermarkMs() + 1))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Batch form of the hourly tumbling aggregate (oracle-checked as e1).
    * `hour` is cast to TIMESTAMP_NTZ so the parquet output matches the
    * oracle's naive-microsecond timestamps (session TZ is UTC, so the
    * cast is value-preserving).
    */
  def hourlyByTypeBatch(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Streaming form: same aggregate, incremental with a watermark. */
  def hourlyByTypeStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming twin of the e19 HLL distinct-user registers: literally
    * the SAME operator ([[graft.operators.Hll.registers]]) applied to a
    * streaming frame — the register table is a plain combinable max
    * aggregate, so Spark maintains it incrementally with state bounded
    * at types x 256 rows BY CONSTRUCTION (the sketch's whole point); no
    * watermark or TTL is needed even on an unbounded stream, and
    * complete output re-emits the tiny table per trigger. The batch/
    * stream equivalence is exactly max-merge mergeability (HllSpec).
    */
  def hllRegistersStream(events: DataFrame): DataFrame =
    graft.operators.Hll.registers(events, Seq("event_type"), col("user_id"))

  /** Streaming twin of e28b's PER-DAY HLL registers (the 14th twin,
    * the continuous-DAU/WAU pipeline): the same combinable max
    * aggregate keyed by ACTIVITY DAY — state bounded at days × 256 BY
    * CONSTRUCTION (user cardinality never enters), so no watermark or
    * TTL on an unbounded stream; complete mode re-emits the register
    * table per trigger. A dashboard runs e28b's trailing-window
    * union-max ([[graft.operators.Rolling.rollupRegisters]]) as a
    * batch read over the maintained sink — equivalence is max-merge
    * mergeability twice over (per-day, then per-window; StreamingSpec
    * pins both against the one-pass batch form).
    */
  def dailyHllRegistersStream(events: DataFrame): DataFrame =
    graft.operators.Hll.registers(
      events.select(date_trunc("day", col("ts")).as("d"), col("user_id")),
      Seq("d"), col("user_id"))

  /** Streaming twin of the t44/e23 Count-Min registers: the SAME
    * combinable aggregation ([[graft.operators.CountMin.registersOver]])
    * over a streaming frame — frequency counterpart to the HLL twin
    * above. State is bounded at depth x width BY CONSTRUCTION, so no
    * watermark or TTL is needed on an unbounded stream; complete mode
    * re-emits the fixed-size grid per trigger, answering "how often has
    * each event type been seen so far" with the CMS overestimate bound.
    */
  def countMinRegistersStream(events: DataFrame,
                              depth: Int = 4, width: Int = 64): DataFrame =
    graft.operators.CountMin.registersOver(
      events.select(col("event_type")), col("event_type"), depth, width)

  /** Streaming twin of the q57 quantile-sketch registers (the 16th
    * twin, completing the sketch-family trio of stream forms beside
    * HLL distincts and CMS frequencies): the SAME log-binned count
    * aggregate ([[graft.operators.QuantileSketch.registers]]) over a
    * streaming frame — a plain combinable COUNT keyed by (type, bin),
    * so state is bounded at types x <=1040 bins BY CONSTRUCTION and no
    * watermark or TTL is needed on an unbounded stream; complete mode
    * re-emits the register table per trigger. A dashboard reads
    * quantiles off the maintained sink with
    * [[graft.operators.QuantileSketch.quantile]]; batch == stream is
    * count ADDITION mergeability (the q57b property), StreamingSpec
    * pins it registers-exact and through the quantile read.
    */
  def quantileRegistersStream(events: DataFrame): DataFrame =
    graft.operators.QuantileSketch.registers(
      events.select(col("event_type"), col("value")),
      Seq("event_type"), floor(col("value") * 100))

  /** Batch form of the HOPPING (sliding) window count: 1-hour windows
    * every 30 minutes — each event lands in two windows (oracle-checked
    * as e9; Spark's window() is usable in batch plans directly).
    */
  def hoppingByTypeBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))

  /** Streaming form: same hopping aggregate, incremental with a
    * watermark; state is bounded by watermark retention x (window/slide)
    * open windows per key.
    */
  def hoppingByTypeStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Batch form of the hourly top-k trending event types (oracle-checked
    * as e12): per hour, the k most frequent types with deterministic
    * (count desc, type asc) ranking. Composes the [[graft.functions
    * .GraftFunctions.topk_by]] bounded-heap aggregate (q28's operator) on
    * top of the hourly count — the exchange carries hours x partitions x
    * k rows, never the full (hour, type) table through a sort.
    */
  def topTypesPerHourBatch(events: DataFrame, k: Int = 3): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("hour"))
      .agg(graft.functions.GraftFunctions.topk_by(
        struct((-col("n")).as("nn"), col("event_type")),
        struct(col("event_type"), col("n")), k).as("top"))
      .select(col("hour"), posexplode(col("top")).as(Seq("rnk0", "r")))
      .select(col("hour"), (col("rnk0") + 1).cast("long").as("rnk"),
        col("r.event_type").as("event_type"), col("r.n").as("n"))
      .orderBy(col("hour"), col("rnk"))

  /** Batch form of dimension-enriched hourly counts (oracle-checked as
    * e15): events join the customer dimension on user_id and aggregate
    * per (hour, market segment). The dimension is genuinely-fixed-size
    * relative to the stream, so it broadcasts.
    */
  def enrichedHourlyBatch(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy(col("hour"), col("segment"))

  /** Streaming form: the STREAM-STATIC join — each micro-batch joins the
    * static dimension snapshot (re-read per trigger by Structured
    * Streaming's semantics, so dimension updates between triggers are
    * picked up), then the watermarked windowed aggregate. State is the
    * window aggregate's only; the join itself is stateless.
    */
  def enrichedHourlyStream(events: DataFrame, customers: DataFrame,
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("segment"),
        col("n"), col("total_value"))

  case class HourTop(hour: java.sql.Timestamp, rnk: Long, event_type: String, n: Long)
  case class TopCounts(counts: Map[String, Long])

  /** Streaming form: per-hour type counts held as explicit state, the
    * ranked top-k emitted EXACTLY ONCE per hour when the watermark passes
    * the hour's end (append semantics — downstream sees only finalized
    * rankings, the streaming analogue of the batch result). State per
    * open hour is one (type -> count) map, bounded by the type vocabulary
    * and dropped at emission; open hours are bounded by the watermark.
    */
  def topTypesPerHourStream(events: Dataset[Event], k: Int = 3,
                            watermark: String = "2 hours"): Dataset[HourTop] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => e.ts.getTime / 3600000L * 3600000L)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hourMs: Long, evs: Iterator[Event], state: GroupState[TopCounts]) =>
          if (state.hasTimedOut) {
            val counts = state.get.counts
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .iterator.zipWithIndex.map { case ((t, n), i) =>
                HourTop(new java.sql.Timestamp(hourMs), (i + 1).toLong, t, n)
              }
          } else {
            val m = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
            val upd = evs.foldLeft(m) { (acc, e) =>
              acc.updated(e.event_type, acc.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(TopCounts(upd))
            // finalize once the watermark passes the end of this hour
            armTimeout(state, hourMs + 3600000L, 0L)
            Iterator.empty
          }
      }
  }

  case class HourFlag(hour: java.sql.Timestamp, event_type: String, n: Long,
      base_cnt: Long, flag: Boolean)
  case class AnomState(open: Map[Long, Long], closed: Vector[(Long, Long)])

  /** Streaming twin of [[graft.operators.Anomaly.trailingCountAnomalies]]:
    * per key, open hours accumulate counts as explicit state; when the
    * watermark passes an hour's end the hour is finalized IN ORDER
    * against the trailing deque of the last `window` closed hours using
    * the same exact integer z-test, emitted exactly once (append), and
    * pushed onto the baseline. State per key is bounded:
    * watermark-open hours plus `window` closed (hour, count) pairs —
    * the streaming form of the batch ROWS frame, observed-hours
    * semantics included (an hour with no events never enters either
    * side's baseline). The closed-hour deque is retained for keys gone
    * quiet — the batch frame REQUIRES that history when the key
    * resumes — so, like the other no-TTL twins, this is exact on
    * finite key domains (event types), not on unbounded ones.
    */
  def countAnomaliesStream(events: Dataset[Event], window: Int = 24, z: Int = 2,
                           minBaseline: Int = 8,
                           watermark: String = "2 hours"): Dataset[HourFlag] = {
    import events.sparkSession.implicits._
    val zz = z.toLong * z
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, evs: Iterator[Event], state: GroupState[AnomState]) =>
          var st = state.getOption.getOrElse(AnomState(Map.empty, Vector.empty))
          val upd = evs.foldLeft(st.open) { (m, e) =>
            val h = e.ts.getTime / 3600000L * 3600000L
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          st = st.copy(open = upd)
          // close every hour the watermark has passed, oldest first, each
          // flagged against the baseline as of ITS close — the sequential
          // semantics the batch ROWS frame states
          val wm = state.getCurrentWatermarkMs()
          val (done, still) = st.open.partition { case (h, _) => h + 3600000L <= wm }
          val out = scala.collection.mutable.ArrayBuffer.empty[HourFlag]
          var closed = st.closed
          done.toSeq.sortBy(_._1).foreach { case (h, n) =>
            val base = closed.takeRight(window)
            val c = base.length.toLong
            val s = base.iterator.map(_._2).sum
            val q = base.iterator.map(p => p._2 * p._2).sum
            val dev = n * c - s
            val flag = c >= minBaseline && dev * dev > zz * (c * q - s * s)
            out += HourFlag(new java.sql.Timestamp(h), key, n, c, flag)
            closed = (closed :+ (h, n)).takeRight(window)
          }
          st = AnomState(still, closed)
          state.update(st)
          // wake when the earliest still-open hour can close
          still.keys.minOption.foreach(h => armTimeout(state, h + 3600000L, 0L))
          out.iterator
      }
  }

  /** Per-session rows via Spark's NATIVE dynamic-gap `session_window`
    * (oracle-checked as e16): one row per (user, session) with the
    * session's start and event count. The built-in sibling of
    * [[sessionizeBatch]]'s per-user totals — the planner handles window
    * merging, so this form also runs incrementally ([[sessionWindowsStream]])
    * where the state store merges overlapping windows per key.
    * Boundary semantics: an event at exactly `gap` after its
    * predecessor STARTS a new session (the window extends [ts, ts+gap)).
    */
  def sessionWindowsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("sess_start"), col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Streaming form: watermarked native session windows — append mode
    * emits each session exactly once when the watermark passes its
    * close; state is the open windows per user, merged by the store.
    */
  def sessionWindowsStream(events: DataFrame, gapMinutes: Int = 30,
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"), col("n_events"))

  /** Batch sessionization: a session ends after `gapMinutes` of user
    * inactivity (oracle-checked as e2 — lag + running flag sum).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > expr(s"INTERVAL '$gapMinutes' MINUTE"), 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessState(lastTs: Long, nSessions: Long, nEvents: Long)

  case class FunnelTimes(t: Seq[Long]) // stage micros, -1 = not reached
  case class FunnelProgress(user_id: Long, reached: Long, t_us: Seq[Option[Long]])

  case class Scd2State(tpe: String, fromMicros: Long, segId: Long)
  case class Scd2Closed(user_id: Long, seg_id: Long, event_type: String,
      valid_from: Long, valid_to: Long)

  /** Full-precision epoch micros of a Timestamp (getTime alone floors
    * to millis; the sub-milli micros live in getNanos).
    */
  private def microsOf(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming twin of the e21 SCD TYPE-2 build: per-user state holds
    * the OPEN attribute segment; an arriving event with a different
    * event_type CLOSES it (emitting the finished validity interval —
    * append-mode, each closed segment exactly once) and opens the next.
    * The emitted rows equal the batch form's valid_to-NOT-NULL rows;
    * the open segment per user stays in state (it is the batch form's
    * NULL-valid_to row, by definition not yet emittable).
    *
    * Delivery contract (documented, not hidden): SCD2 state transitions
    * are order-DEPENDENT, so this twin requires per-key in-order
    * delivery across batches — the Kafka-partitioned-by-key regime;
    * within a batch arrivals are sorted by (ts, event_id) like the
    * sessionize twin. Cross-batch disorder needs the batch operator.
    *
    * State: ONE small record per user — bounded by the key space, never
    * by the stream.
    */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[Scd2State]) =>
          var out = List.empty[Scd2Closed]
          var s = state.getOption.orNull
          evs.toSeq.sortBy(e => (microsOf(e.ts), e.event_id)).foreach { e =>
            val m = microsOf(e.ts)
            if (s == null) s = Scd2State(e.event_type, m, e.event_id)
            else if (s.tpe != e.event_type) {
              out ::= Scd2Closed(uid, s.segId, s.tpe, s.fromMicros, m)
              s = Scd2State(e.event_type, m, e.event_id)
            }
          }
          if (s != null) state.update(s)
          out.reverse.iterator
      }
  }

  /** Streaming sessionization with explicit per-user state: emits the
    * running (n_sessions, n_events) per user on every trigger; state is
    * one record per user.
    *
    * `stateTtl` bounds that state for unbounded streams with churning
    * users: a user idle past the TTL (by event time — the caller must set
    * `withWatermark` on the input) has their record dropped, and a later
    * return restarts their counts from zero. That is the bounded-state
    * contract: running totals are exact within the TTL horizon,
    * best-effort beyond it. `stateTtl = None` keeps state forever
    * (exact, unbounded — only safe on finite key domains).
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       stateTtl: Option[String] = None): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val ttlMs = stateTtl.map(ttlMillis)
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: drop the per-user record (nothing to emit
            // — the last update already carried the final counts)
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
            // within a batch, process this user's events in time order
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val tsMicros = e.ts.getTime * 1000L
              val newSess = s.lastTs == Long.MinValue || tsMicros - s.lastTs > gapMicros
              s = SessState(tsMicros, s.nSessions + (if (newSess) 1 else 0), s.nEvents + 1)
            }
            state.update(s)
            // Spark clears the registered timeout on every invocation:
            // re-arm from the latest event time, clamped above the watermark
            for (t <- ttlMs) armTimeout(state, s.lastTs / 1000L, t)
            Iterator.single(UserSessions(uid, s.nSessions, s.nEvents))
          }
      }
  }

  /** Batch form of click->purchase attribution (oracle-checked as e6):
    * every (purchase, click) pair for the same user with the click in the
    * hour before (inclusive) the purchase. Equality join on user_id with
    * the time bound as a post-join range filter — Spark plans a hash/SMJ
    * on user_id, never a cross product.
    */
  def attributionBatch(events: DataFrame, window: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    p.join(c, "user_id")
      .filter(col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Streaming form: watermarked stream-stream inner join with a time-
    * interval condition. The watermark + interval bound lets Spark expire
    * click state older than window+watermark — state stays O(recent
    * events), the requirement for an unbounded stream.
    */
  def attributionStream(events: DataFrame, window: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c, expr(
      s"p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL $window AND p_ts"))
      .select(col("purchase_id"), col("click_id"))
  }

  /** LEFT-OUTER form of the attribution join (oracle-checked as e20):
    * EVERY purchase appears — with its in-window clicks, or with a NULL
    * click_id when none preceded it (the "unattributed conversion" gap
    * report e6's inner join cannot express). Same equi+range plan shape.
    */
  def attributionGapsBatch(events: DataFrame, window: String = "1 hour"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c, expr(
      s"p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL $window AND p_ts"),
      "left_outer")
      .select(col("purchase_id"), col("click_id"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Streaming twin: watermarked stream-stream LEFT OUTER interval join —
    * the semantics the inner attributionStream cannot give. Matched rows
    * emit as they join; an unmatched purchase emits its NULL-click row
    * only once BOTH watermarks pass its join window (Spark must prove no
    * future click can match before it may say "none did"), which is why
    * the twin spec advances the watermark with a sentinel event before
    * asserting convergence. State stays O(window + watermark) on both
    * sides, exactly as the inner form.
    */
  def attributionGapsStream(events: DataFrame, window: String = "1 hour",
                            watermark: String = "2 hours"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c, expr(
      s"p_user = c_user AND c_ts BETWEEN p_ts - INTERVAL $window AND p_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("click_id"))
  }

  /** Streaming exact dedup on a key column: first occurrence wins, later
    * duplicates are dropped (the streaming counterpart of
    * Ingest.dedupKeepFirst). State: one record per seen key.
    *
    * `ttl` bounds the state for unbounded streams: each key's state
    * expires once the event-time watermark passes its first-seen ts + ttl
    * (the caller must set `withWatermark` on the input). The documented
    * tradeoff: a duplicate arriving after expiry is re-emitted — dedup is
    * exact within the TTL horizon, best-effort beyond it, which is the
    * standard contract (Spark's own dropDuplicates-with-watermark works
    * the same way). `ttl = None` keeps state forever (exact, unbounded).
    */
  /** Streaming twin of [[graft.operators.Compact.latestByKey]] over the
    * events schema: one state row per user holding the newest event so
    * far ((ts, event_id) total order, exactly the batch operator's), an
    * updated best emitted per key per batch (Update output mode). State
    * is one Event per live key — the same keys-not-log bound as the
    * batch aggregate's exchange; a TTL can bound the key domain itself
    * the same way streamingDedup's does.
    */
  def latestByKeyStream(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[Event], state: GroupState[Event]) =>
          def key(e: Event) = (e.ts.getTime, e.event_id)
          val incoming = evs.maxBy(key)
          val best = state.getOption match {
            case Some(cur) if Ordering[(Long, Long)].gteq(key(cur), key(incoming)) => cur
            case _ => state.update(incoming); incoming
          }
          best
      }
  }

  /** Streaming twin of [[graft.operators.Funnel.stages]] (gate e25's
    * batch form): per-user ordered-funnel progress maintained as ONE
    * tiny state row — the n stage times, each set exactly once.
    *
    * Exactness contract: per-key in-order delivery across batches (the
    * same contract [[scd2Stream]] documents; within a batch this
    * function sorts the user's events itself). Under in-order arrival
    * the incremental update IS the batch semantics: the first step-k
    * event strictly after (and within the gap of) the stage-(k-1) time
    * is the min the batch aggregate would pick, and stage times are
    * never lowered afterwards — so no event buffering is needed and
    * state stays O(steps) per user. Out-of-order replay would need
    * watermark-buffered retention (a late stage-1 event can re-admit
    * an already-discarded stage-2 event); that regime is served by the
    * batch form over the lake, not by growing unbounded stream state.
    *
    * Emits the user's updated progress per batch (Update mode); only
    * users who have completed stage 1 emit, matching the batch output.
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   maxGapSeconds: Option[Long] = None): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      s"funnel: need >= 2 distinct steps, got $steps")
    val stepIdx = steps.zipWithIndex.toMap
    val gapMicros = maxGapSeconds.map(_ * 1000000L)
    def micros(ts: java.sql.Timestamp): Long =
      (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .filter(e => stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[FunnelTimes]) =>
          val t = state.getOption.map(_.t.toArray)
            .getOrElse(Array.fill(steps.size)(-1L))
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val k = stepIdx(e.event_type)
            val ts = micros(e.ts)
            val prevOk = k == 0 ||
              (t(k - 1) >= 0 && ts > t(k - 1) &&
                gapMicros.forall(g => ts <= t(k - 1) + g))
            if (t(k) < 0 && prevOk) t(k) = ts
          }
          state.update(FunnelTimes(t.toSeq))
          if (t(0) < 0) Iterator.empty
          else Iterator.single(FunnelProgress(uid,
            t.takeWhile(_ >= 0).length.toLong,
            t.map(x => if (x >= 0) Some(x) else None).toSeq))
      }
  }

  /** Batch twin of [[streamingDedup]] (gate e30): at-least-once delivery
    * collapsed to exactly-once by key. Batch needs no arrival-order
    * state — dropDuplicates keeps an arbitrary row per event_id, which
    * equals streamingDedup's first-arrival row whenever redelivery is
    * byte-identical (the at-least-once contract; rows that DIFFER under
    * one id are upstream corruption both forms surface, not resolve).
    * One key exchange; at 100 TB this is the keys-not-log shuffle d1
    * uses, and the streaming form bounds state the same way via TTL.
    */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  def streamingDedup(events: Dataset[Event], ttl: Option[String] = None): Dataset[Event] = {
    import events.sparkSession.implicits._
    val ttlMs = ttl.map(ttlMillis)
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    // state = first-seen event-time millis. Spark CLEARS the registered
    // timeout on every function invocation, so each duplicate arrival
    // must re-arm it from the stored first-seen time (otherwise one dup
    // would silently pin the state forever). The re-arm goes through
    // armTimeout: a dup arriving on live state whose first-seen+ttl the
    // watermark has already passed must clamp, not crash.
    events
      .groupByKey(_.event_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, evs: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            for (t <- ttlMs) armTimeout(state, state.get, t)
            Iterator.empty
          } else {
            val first = evs.take(1).toSeq
            for (e <- first.headOption) {
              state.update(e.ts.getTime)
              for (t <- ttlMs) armTimeout(state, e.ts.getTime, t)
            }
            first.iterator
          }
      }
  }
}
