package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, window}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private def eventsDir: String = {
    // file-source streams read a directory; stage the single parquet file
    val dir = Files.createTempDirectory("graft-events").toString
    // restage through Tables.events: converts the NANOS timestamps to
    // Spark-native micros so the file stream source can read the schema
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming Count-Min registers converge to the batch grid (bounded state, no watermark)") {
    val dir = eventsDir
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.countMinRegistersStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cm_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = EventsStream.countMinRegistersStream(
        spark.read.parquet(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // state bound: the grid never exceeds depth x width cells
      assert(streamed.size <= 4 * 64)
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch sketch (bounded state, no watermark)") {
    val dir = eventsDir
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.hllRegistersStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hll_out")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      val batch = graft.operators.Hll.registers(
        spark.read.parquet(dir), Seq("event_type"),
        org.apache.spark.sql.functions.col("user_id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming hourly aggregate converges to the batch result") {
    val dir = eventsDir
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.hourlyByTypeStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      // streaming window.start is LTZ Timestamp; batch hour is NTZ
      // LocalDateTime (session TZ = UTC, so instants align)
      def hourOf(r: org.apache.spark.sql.Row): java.time.LocalDateTime = r.get(0) match {
        case t: java.sql.Timestamp => t.toLocalDateTime
        case l: java.time.LocalDateTime => l
      }
      val streamed = spark.table("hourly_out")
        .collect().map(r => (hourOf(r), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventsStream.hourlyByTypeBatch(spark.read.parquet(dir))
        .collect().map(r => (hourOf(r), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment join converges to the batch result") {
    val dir = eventsDir
    val customers = Tables.customer(spark, sfDir)
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.enrichedHourlyStream(stream, customers)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enr_out")
      .start()
    try {
      q.processAllAvailable()
      def hourOf(r: org.apache.spark.sql.Row): java.time.LocalDateTime = r.get(0) match {
        case t: java.sql.Timestamp => t.toLocalDateTime
        case l: java.time.LocalDateTime => l
      }
      val streamed = spark.table("enr_out")
        .collect().map(r => (hourOf(r), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventsStream.enrichedHourlyBatch(spark.read.parquet(dir), customers)
        .collect().map(r => (hourOf(r), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming hopping-window aggregate converges to the batch result") {
    val dir = eventsDir
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.hoppingByTypeStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hopping_out")
      .start()
    try {
      q.processAllAvailable()
      def winOf(r: org.apache.spark.sql.Row): java.time.LocalDateTime = r.get(0) match {
        case t: java.sql.Timestamp => t.toLocalDateTime
        case l: java.time.LocalDateTime => l
      }
      val streamed = spark.table("hopping_out")
        .collect().map(r => (winOf(r), r.getString(1), r.getLong(2))).toSet
      val batch = EventsStream.hoppingByTypeBatch(spark.read.parquet(dir))
        .collect().map(r => (winOf(r), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
      // every event lands in exactly two 1h/30m windows: total count 2x
      val total = batch.toSeq.map(_._3).sum
      assert(total === 2 * spark.read.parquet(dir).count())
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch range join") {
    val dir = eventsDir
    val stream = spark.readStream
      .schema(EventsStream.eventsSchema)
      .parquet(dir)
    val q = EventsStream.attributionStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventsStream.attributionBatch(spark.read.parquet(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER attribution emits NULL-click gaps after the watermark closes") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
    val input = MemoryStream[Event]
    val q = EventsStream.attributionGapsStream(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("gaps_out")
      .start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // NULL-click rows may only emit once both watermarks pass every
      // purchase's join window. The watermark is per event-time column
      // AFTER the type filter, so the sentinels must BE a click and a
      // purchase (a 'noop' type would advance neither). Distinct users
      // and offset times keep them from joining each other; the future
      // purchase itself never emits (no watermark ever passes it).
      val maxTs = events.map(_.ts.getTime).max
      input.addData(
        Event(999999999L, new java.sql.Timestamp(maxTs + 48L * 3600 * 1000),
          0L, "click", 0.0, "{}"),
        Event(999999998L, new java.sql.Timestamp(maxTs + 49L * 3600 * 1000),
          1L, "purchase", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(
        Event(999999997L, new java.sql.Timestamp(maxTs + 50L * 3600 * 1000),
          0L, "click", 0.0, "{}"),
        Event(999999996L, new java.sql.Timestamp(maxTs + 51L * 3600 * 1000),
          1L, "purchase", 0.0, "{}"))
      q.processAllAvailable()
      val streamed = spark.table("gaps_out")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        .filter(_._1 < 999999000L).toSet
      val batch = EventsStream.attributionGapsBatch(Tables.events(spark, sfDir))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(streamed === batch)
      // the corpus must actually exercise BOTH row classes
      assert(batch.exists(_._2 == -1L) && batch.exists(_._2 != -1L))
    } finally q.stop()
  }

  test("stateful streaming sessionization matches the batch window version") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
    val input = MemoryStream[Event]
    val q = EventsStream.sessionizeStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sess_out")
      .start()
    try {
      // feed in two chronological chunks to exercise cross-batch state
      val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
      val (first, second) = sorted.splitAt(sorted.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      // last update per user wins
      val streamed = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.last }
        .values.map(t => (t._1, t._2, t._3)).toSet
      val batch = EventsStream.sessionizeBatch(Tables.events(spark, sfDir))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming latest-by-key compaction matches the batch max_by operator") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
    val input = MemoryStream[Event]
    val q = EventsStream.latestByKeyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_out")
      .start()
    try {
      // adversarial feed: REVERSE chronological halves, so the stream
      // must keep the stored winner when late (older) versions arrive
      val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
      val (older, newer) = sorted.splitAt(sorted.length / 2)
      input.addData(newer)
      q.processAllAvailable()
      input.addData(older)
      q.processAllAvailable()
      val streamed = spark.table("latest_out")
        .collect().map(r => (r.getLong(2), r.getLong(0))) // (user_id, event_id)
        .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
      val batch = graft.operators.Compact
        .latestByKey(Tables.events(spark, sfDir),
          Seq("user_id"), Seq("ts", "event_id"))
        .select("user_id", "event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming hourly top-k types: finalized rankings match the batch operator") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    val q = EventsStream.topTypesPerHourStream(input.toDS(), k = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("topk_out")
      .start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      // push the watermark far past the last real hour so it finalizes
      val lastTs = events.last.ts.getTime
      val sentinel = Event(999999L,
        new java.sql.Timestamp(lastTs + 24L * 3600000L), 1L, "sentinel", 0.0, "{}")
      input.addData(Seq(sentinel))
      q.processAllAvailable()
      val sentinelHour = sentinel.ts.getTime / 3600000L * 3600000L
      val streamed = spark.table("topk_out")
        .filter(col("hour") =!= new java.sql.Timestamp(sentinelHour))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      // batch `hour` is timestamp_ntz (LocalDateTime) — cast back to a
      // session-UTC timestamp so both sides compare as epoch millis
      val batch = EventsStream.topTypesPerHourBatch(Tables.events(spark, sfDir), k = 3)
        .withColumn("hour", col("hour").cast("timestamp"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
      // every finalized hour was emitted exactly once (no duplicate ranks)
      val dupes = spark.table("topk_out").groupBy("hour", "rnk")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      assert(dupes.isEmpty)
    } finally q.stop()
  }

  test("streaming anomaly flags: finalized hours match the batch integer z-test") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    val q = EventsStream.countAnomaliesStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out")
      .start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val lastTs = events.last.ts.getTime
      input.addData(Seq(Event(999999L,
        new java.sql.Timestamp(lastTs + 26L * 3600000L), 1L, "sentinel", 0.0, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("anom_out")
        .filter(col("event_type") =!= "sentinel")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .toSet
      val batch = graft.operators.Anomaly
        .trailingCountAnomalies(Tables.events(spark, sfDir), "ts", "event_type")
        .withColumn("hour", col("hour").cast("timestamp"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("native session windows: streaming append matches the batch per-session rows") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    val q = EventsStream.sessionWindowsStream(input.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("sw_out")
      .start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val lastTs = events.last.ts.getTime
      val sentinelTs = new java.sql.Timestamp(lastTs + 26L * 3600000L)
      input.addData(Seq(Event(999999L, sentinelTs, 1L, "sentinel", 0.0, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("sw_out")
        .filter(col("sess_start") < lit(sentinelTs))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet
      val batch = EventsStream.sessionWindowsBatch(Tables.events(spark, sfDir))
        .withColumn("sess_start", col("sess_start").cast("timestamp"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming SCD2: closed segments match the batch build's non-NULL intervals") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val events = Tables.events(spark, sfDir).as[Event].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    val q = EventsStream.scd2Stream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_out")
      .start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      val batch = SparkEntry.queries("e21_scd2_intervals")(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("valid_to").isNotNull)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
      // open segments stay in state: one per user, = the batch NULL rows
      val nOpen = SparkEntry.queries("e21_scd2_intervals")(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("valid_to").isNull).count()
      val nUsers = Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(nOpen === nUsers)
    } finally q.stop()
  }

  test("watermark finalizes windows and drops too-late events (append mode)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def ev(id: Long, t: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, "view", v, "{}")
    val input = MemoryStream[Event]
    val agg = input.toDS().toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("hour"), $"n")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      input.addData(Seq(ev(1, "2024-01-01 00:10:00", 1), ev(2, "2024-01-01 00:20:00", 1)))
      q.processAllAvailable()
      // advance event time far past the watermark -> 00:00 window finalizes
      input.addData(Seq(ev(3, "2024-01-01 05:00:00", 1)))
      q.processAllAvailable()
      val afterFinalize = spark.table("wm_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(afterFinalize("2024-01-01 00:00:00.0") === 2L)
      // an event 5 hours late lands in an already-finalized window: dropped
      input.addData(Seq(ev(4, "2024-01-01 00:30:00", 1)))
      q.processAllAvailable()
      input.addData(Seq(ev(5, "2024-01-01 09:00:00", 1))) // push watermark so 05:00 emits
      q.processAllAvailable()
      val fin = spark.table("wm_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(fin("2024-01-01 00:00:00.0") === 2L, "late event must not resurrect the window")
      assert(fin("2024-01-01 05:00:00.0") === 1L)
    } finally q.stop()
  }

  test("funnel twins: streaming per-user progress equals the batch aggregate chain (e25)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, et: String) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, et, 1.0, "{}")
    // u1 completes all three; u2 clicks BEFORE viewing (click ignored,
    // re-click later counts); u3 views only; u4 purchases with no view
    // (no stage-1 -> absent from both outputs); the gap case: u5's
    // purchase lands past the 2h window of the click
    val batch1 = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "view"),
      ev(2, "2024-01-01 00:10:00", 1, "click"),
      ev(3, "2024-01-01 00:05:00", 2, "click"),
      ev(4, "2024-01-01 00:06:00", 2, "view"),
      ev(5, "2024-01-01 00:07:00", 3, "view"),
      ev(6, "2024-01-01 00:08:00", 4, "purchase"),
      ev(7, "2024-01-01 00:09:00", 5, "view"),
      ev(8, "2024-01-01 00:11:00", 5, "click"))
    val batch2 = Seq(
      ev(9, "2024-01-01 00:20:00", 1, "purchase"),
      ev(10, "2024-01-01 00:30:00", 2, "click"),
      ev(11, "2024-01-01 03:00:00", 5, "purchase")) // 2h49m after the click
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[Event]
    val q = EventsStream.funnelStream(input.toDS(), steps,
        maxGapSeconds = Some(2L * 3600))
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_twin_out")
      .start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      // reached is monotone and stage times are set-once, so the
      // max-reached row per user is the final state
      val streamed = spark.table("funnel_twin_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).toSeq))
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      val batchDf = graft.operators.Funnel.stages(
        (batch1 ++ batch2).toDF(), "user_id", "event_type", "ts", steps,
        maxGapSeconds = Some(2L * 3600))
      val batch = batchDf.collect().map(r => (r.getLong(0), r.getLong(1),
        Seq(if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4)))).toSet
      assert(streamed === batch)
      val byUser = batch.map(t => t._1 -> t._2).toMap
      assert(byUser === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 5L -> 2L)) // u4 absent, u5 gap-blocked
    } finally q.stop()
  }

  test("dedup twins: batch dedupBatch equals streamingDedup on redelivered input (e30)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, "view", 1.0, "{}")
    // at-least-once: every event delivered twice, one thrice, across batches
    val unique = Seq(ev(1L, "2024-01-01 00:00:00", 1L),
      ev(2L, "2024-01-01 00:05:00", 2L), ev(3L, "2024-01-01 00:10:00", 1L))
    val input = MemoryStream[Event]
    val q = EventsStream.streamingDedup(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_twin_out")
      .start()
    try {
      input.addData(unique :+ ev(1L, "2024-01-01 00:00:00", 1L))
      q.processAllAvailable()
      input.addData(Seq(ev(2L, "2024-01-01 00:05:00", 2L),
        ev(3L, "2024-01-01 00:10:00", 1L), ev(1L, "2024-01-01 00:00:00", 1L)))
      q.processAllAvailable()
      val streamed = spark.table("dedup_twin_out")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val batch = EventsStream.dedupBatch(
        (unique ++ unique :+ ev(1L, "2024-01-01 00:00:00", 1L)).toDF())
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(batch === Set((1L, 1L), (2L, 2L), (3L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup TTL: state expires with the watermark; post-expiry dup re-emits") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def ev(id: Long, t: String) =
      Event(id, java.sql.Timestamp.valueOf(t), 1L, "view", 1.0, "{}")
    val input = MemoryStream[Event]
    val q = EventsStream.streamingDedup(
      input.toDS().withWatermark("ts", "10 minutes"), ttl = Some("1 hour"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_ttl_out")
      .start()
    try {
      input.addData(Seq(ev(1L, "2024-01-01 00:00:00")))
      q.processAllAvailable()
      // within the TTL horizon: duplicate dropped
      input.addData(Seq(ev(1L, "2024-01-01 00:30:00")))
      q.processAllAvailable()
      assert(spark.table("dedup_ttl_out").count() === 1)
      // advance the watermark past first-seen + 1h...
      input.addData(Seq(ev(2L, "2024-01-01 03:00:00")))
      q.processAllAvailable()
      // ...and run one more batch: timed-out groups fire only on batches
      // where they receive no data (flatMapGroupsWithState semantics)
      input.addData(Seq(ev(3L, "2024-01-01 03:05:00")))
      q.processAllAvailable()
      // post-expiry duplicate re-emits (the documented TTL tradeoff:
      // exact within the horizon, best-effort beyond — state stays bounded)
      input.addData(Seq(ev(1L, "2024-01-01 03:10:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_ttl_out").collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) === 2)
      assert(ids.count(_ == 2L) === 1)
    } finally q.stop()
  }

  test("sessionization state expires after the TTL; a returning user restarts counts") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long = 7L) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, "view", 1.0, "{}")
    val input = MemoryStream[Event]
    val q = EventsStream.sessionizeStream(
        input.toDS().withWatermark("ts", "10 minutes"),
        gapMinutes = 30, stateTtl = Some("1 hour"))
      .writeStream.outputMode("update")
      .format("memory").queryName("sess_ttl_out")
      .start()
    try {
      input.addData(Seq(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:10:00")))
      q.processAllAvailable() // user 7: 1 session, 2 events
      // push the watermark far past 00:10 + TTL with a different user...
      input.addData(Seq(ev(3, "2024-01-01 05:00:00", uid = 8L)))
      q.processAllAvailable()
      // ...then a batch with no data for user 7 fires their timeout
      // (timed-out groups fire only on batches where they receive no data)
      input.addData(Seq(ev(4, "2024-01-01 05:05:00", uid = 8L)))
      q.processAllAvailable()
      // user 7 returns after the gap: state was dropped, counts restart
      input.addData(Seq(ev(5, "2024-01-01 06:00:00")))
      q.processAllAvailable()
      val user7 = spark.table("sess_ttl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 == 7L)
      assert(user7.head === ((7L, 1L, 2L)))
      assert(user7.last === ((7L, 1L, 1L)),
        "post-expiry return must restart counts from dropped state")
    } finally q.stop()
  }

  test("timeout re-arm clamps a below-watermark timestamp instead of throwing") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // the ADVICE r2 crash: a duplicate on live state re-arms from
    // first-seen+ttl, which the watermark has already passed —
    // GroupStateImpl rejects such timestamps with IllegalArgumentException
    val wm = 10200000L
    val state = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wm)), hasTimedOut = false)
    EventsStream.armTimeout(state, 0L, 3600000L) // desired 01:00 < wm: must clamp, not throw
    assert(state.getTimeoutTimestampMs.get() === wm + 1)
    // the un-clamped path still arms at base+ttl
    val state2 = TestGroupState.create[Long](
      optionalState = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)), timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1000L)), hasTimedOut = false)
    EventsStream.armTimeout(state2, 0L, 3600000L)
    assert(state2.getTimeoutTimestampMs.get() === 3600000L)
  }

  test("streaming dedup writes exactly-once to a parquet sink (file sink + checkpoint)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, v: Double) = Event(id, t0, 1L, "view", v, "{}")
    val outDir = Files.createTempDirectory("graft-stream-sink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val input = MemoryStream[Event]
    val q = EventsStream.streamingDedup(input.toDS())
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      input.addData(Seq(ev(1, 1.0), ev(2, 2.0), ev(1, 99.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(2, 98.0), ev(3, 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    // the file sink's commit log makes the output exactly-once: batch
    // reads see each first-occurrence exactly once, duplicates never
    // (restart-resume against the same checkpoint requires a durable
    // replayable source — MemoryStream is neither, so that path is
    // covered by the sink's commit-log contract, not re-tested here)
    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1)
    assert(rows === Array((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("streaming dedup keeps first occurrence across batches") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, v: Double) = Event(id, t0, 1L, "view", v, "{}")
    val input = MemoryStream[Event]
    val q = EventsStream.streamingDedup(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      input.addData(Seq(ev(1, 1.0), ev(2, 2.0), ev(1, 99.0)))
      q.processAllAvailable()
      input.addData(Seq(ev(2, 98.0), ev(3, 3.0)))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1)
      assert(out === Array((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    } finally q.stop()
  }

  test("curation twins (12th): streaming gate+dedup equals batch Curate.kept under in-order arrival") {
    import spark.implicits._
    import graft.streaming.CurateStream
    import graft.streaming.CurateStream.CuratedDoc
    implicit val sctx = spark.sqlContext
    // quality gate: long wordy english text passes, junk fails; dup
    // texts (exact + whitespace/case variants — the fingerprint
    // canonicalization) appear under several ids ACROSS batches
    val good = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to find some other field of fresh grass to cross"
    val good2 = "a completely different well formed document about the " +
      "merge of batch and stream processing in one engine for all data"
    val docs = Seq(
      CuratedDoc(1L, good, "en"),
      CuratedDoc(2L, "  THE quick   brown fox jumps over a lazy dog and then " +
        "runs far away to find some other field of fresh grass to cross ", "en"),
      CuratedDoc(3L, good2, "en"),
      CuratedDoc(4L, "zzz !!!", "en"),       // fails the quality gate
      CuratedDoc(5L, good2, "de"),           // allowed lang, dup of 3
      CuratedDoc(6L, good2, "fr"),           // lang NOT in allowlist
      CuratedDoc(7L, good, "en"))            // dup of 1
    val langs = Seq("en", "de")
    val batch = CurateStream.curateKeptBatch(docs.toDF(), langs, 0.5)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val input = MemoryStream[CuratedDoc]
    val q = CurateStream.curateKeptStream(input.toDS(), langs, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_twin_out")
      .start()
    try {
      // in-order arrival: ids nondecreasing per fingerprint across batches
      input.addData(docs.take(3))
      q.processAllAvailable()
      input.addData(docs.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("curate_twin_out")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(streamed === batch)
      // gate drops 4 (quality) and 6 (lang); dedup keeps min-id per
      // canonical text: 1 (7 is a dup; 2's variant canonicalizes to a
      // DIFFERENT fingerprint only if case/space survive — lower+collapse
      // makes it a dup of 1 too) and 3 (5 is a dup)
      assert(batch === Set((1L, "en"), (3L, "en")))
    } finally q.stop()
  }

  test("curation stream: a late SMALLER id for a seen fingerprint is counted, not silently kept") {
    import spark.implicits._
    import graft.streaming.CurateStream
    import graft.streaming.CurateStream.CuratedDoc
    implicit val sctx = spark.sqlContext
    val text = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away to find some other field of fresh grass to cross"
    val late = spark.sparkContext.longAccumulator("curate_late_smaller_id")
    val input = MemoryStream[CuratedDoc]
    val q = CurateStream.curateKeptStream(input.toDS(), Seq("en"), 0.5, Some(late))
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_late_out")
      .start()
    try {
      input.addData(Seq(CuratedDoc(5L, text, "en")))
      q.processAllAvailable()
      // contract violation: id 2 arrives AFTER id 5 was kept
      input.addData(Seq(CuratedDoc(2L, text, "en"), CuratedDoc(9L, text, "en")))
      q.processAllAvailable()
      val kept = spark.table("curate_late_out")
        .collect().map(_.getLong(0)).toSeq
      assert(kept === Seq(5L), "exactly-once: first batch's min-id stays kept")
      // only the SMALLER late id counts (9 obeys the in-order contract)
      assert(late.value === 1L,
        s"late-smaller-id counter should read 1, got ${late.value}")
    } finally q.stop()
  }

  test("ANN ingest twins (13th): streamed appendSaved equals batch appendSaved and full-probe search stays exact") {
    import spark.implicits._
    import graft.operators.{Ivf, Knn}
    import graft.streaming.AnnIngestStream
    import org.apache.spark.sql.functions.col
    implicit val sctx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map(i =>
      (i, Array.tabulate(16)(_ => rnd.nextFloat() * 4 - 2)))
    val all = rows.toDF("id", "emb")
    val base = all.filter(col("id") % 5 =!= 0)
    val extra = rows.filter(_._1 % 5 == 0)
    val pathA = Files.createTempDirectory("graft-ann-batch").toString
    val pathB = Files.createTempDirectory("graft-ann-stream").toString
    val idx = Ivf.build(base, "id", "emb", nlist = 4, iters = 3)
    Ivf.save(idx, pathA); Ivf.save(idx, pathB)
    // batch path: one appendSaved of the whole extra set
    Ivf.appendSaved(spark, pathA, extra.toDF("id", "emb"), "id", "emb")
    // stream path: the same rows in two ordered micro-batches
    val input = MemoryStream[(Long, Array[Float])]
    val q = AnnIngestStream.ingest(input.toDF().toDF("id", "emb"), pathB,
      "id", "emb", Files.createTempDirectory("graft-ann-ckpt").toString)
    try {
      input.addData(extra.take(20)); q.processAllAvailable()
      input.addData(extra.drop(20)); q.processAllAvailable()
    } finally q.stop()
    val probe = rows.head._2
    def hits(path: String) =
      Ivf.searchSaved(spark, path, probe, k = 10, nprobe = 4)
        .select("id").collect().map(_.getLong(0)).toSeq
    // the index cannot tell how its rows arrived
    assert(hits(pathB) === hits(pathA))
    // full-probe search over the appended index equals exact cosine
    // top-k over ALL rows (nothing lost or duplicated by ingestion)
    val exact = Knn.topK(all, col("emb"), probe, k = 10, tieBreak = col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(hits(pathB).sorted === exact.sorted)
  }

  test("rolling-actives twins (14th): streamed per-day registers + rollup equal batch e28b") {
    import spark.implicits._
    import graft.operators.Rolling
    import org.apache.spark.sql.functions.col
    implicit val sctx = spark.sqlContext
    // 4 activity days with heavy user overlap between adjacent days
    val evs = (for (day <- 0 until 4; u <- 0 until 150) yield
      Event(day * 1000L + u,
        java.sql.Timestamp.valueOf(f"2024-02-0${day + 1}%d 10:00:00"),
        (u + day * 50).toLong, "view", 1.0, "{}")).toVector
    val input = MemoryStream[Event]
    val q = EventsStream.dailyHllRegistersStream(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("dau_regs")
      .start()
    try {
      input.addData(evs.take(300)); q.processAllAvailable()
      input.addData(evs.drop(300)); q.processAllAvailable()
    } finally q.stop()
    // dashboard read: the e28b union-max tail over the maintained sink
    val streamed = Rolling.rollupRegisters(spark.table("dau_regs"), 2)
      .orderBy("day_us", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val batch = Rolling.rollingHllRegisters(evs.toDF(),
      col("ts"), col("user_id"), windowDays = 2)
      .orderBy("day_us", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(streamed === batch)
    assert(streamed.map(_._1).distinct.size === 4)
  }

  test("quantile-register twins (16th): streamed log-bin counts equal batch, and the quantile read agrees") {
    import spark.implicits._
    import graft.operators.QuantileSketch
    import org.apache.spark.sql.functions.{col, floor}
    implicit val sctx = spark.sqlContext
    val evs = (0 until 600).map { i =>
      Event(i.toLong, java.sql.Timestamp.valueOf("2024-02-01 10:00:00"),
        (i % 37).toLong, if (i % 3 == 0) "view" else "buy",
        (i * i % 997) / 10.0 + i, "{}")
    }.toVector
    val input = MemoryStream[Event]
    val q = EventsStream.quantileRegistersStream(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("q_regs")
      .start()
    try {
      input.addData(evs.take(250)); q.processAllAvailable()
      input.addData(evs.drop(250)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("q_regs").orderBy("event_type", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val batch = QuantileSketch.registers(evs.toDF(), Seq("event_type"),
      floor(col("value") * 100))
      .orderBy("event_type", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(streamed === batch)
    assert(streamed.map(_._1).distinct.sorted === Seq("buy", "view"))
    // the dashboard read off the maintained sink: same median estimate
    for (t <- Seq("view", "buy"); p <- Seq(0.5, 0.9)) {
      val s = QuantileSketch.quantile(
        streamed.filter(_._1 == t).map(x => (x._2, x._3)), p)
      val b = QuantileSketch.quantile(
        batch.filter(_._1 == t).map(x => (x._2, x._3)), p)
      assert(s === b, s"quantile($t, $p)")
    }
  }

  test("frontier twins (18th): streamed per-host slot assignment equals the batch FIFO schedule") {
    import spark.implicits._
    import graft.streaming.FrontierStream
    import org.apache.spark.sql.functions.{col, lit, pmod, when}
    implicit val sctx = spark.sqlContext
    // t58's arithmetic incl. the hot host; constant priority = the
    // arrival-order arm the streaming frontier implements
    val cands = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("url_id"))
      .withColumn("host_id",
        when(col("url_id") % 3 === 0, lit(0L)).otherwise(pmod(col("url_id"), lit(37L))))
      .withColumn("delay_s", lit(1L) + pmod(col("host_id"), lit(4L)))
    val batch = graft.operators.Frontier.schedule(cands,
        host = col("host_id"), priority = lit(0L), tie = col("url_id"),
        delaySec = col("delay_s"), perCycle = 8, cycleLenSec = 60L)
      .select("url_id", "host_id", "slot", "fetch_offset_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rows = cands.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val input = MemoryStream[(Long, Long, Long)]
    val q = FrontierStream.scheduleStream(
        input.toDF().toDF("url_id", "host_id", "delay_s"), perCycle = 8, cycleLenSec = 60L)
      .writeStream.outputMode("append")
      .format("memory").queryName("frontier_stream")
      .start()
    try {
      // per-key in-order: ascending url_id split across two micro-batches
      input.addData(rows.take(rows.length / 2).toSeq); q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2).toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("frontier_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    // state is one counter per host: a third batch resumes numbering
    assert(streamed.groupBy(_._2).forall { case (_, g) =>
      g.map(_._3).toSeq.sorted === (0L until g.size).toSeq })
  }

  test("crawl front-door twins (17th): streamed extract+scrub+gate+keep-first equals batch x14 flow") {
    import spark.implicits._
    import graft.streaming.CrawlStream
    import org.apache.spark.sql.functions.col
    implicit val sctx = spark.sqlContext
    def warcBlob(id: Long, status: Int, body: String): Array[Byte] = {
      val http = s"HTTP/1.1 $status OK\r\nContent-Type: text/plain\r\n\r\n$body"
      val full = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/$id\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
      val b = full.getBytes("UTF-8")
      if (id % 13 == 0) b.dropRight(3) else b // torn arm: whole-blob quarantine
    }
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).limit(20).collect().map(_.getString(0))
    // 40 blobs over 20 texts: ids i and i+20 share content (fp dup);
    // PII woven so the scrub stage is live; 404s at id % 5 == 0
    val blobs = (0 until 40).map { i =>
      val status = if (i % 5 == 0) 404 else 200
      (i.toLong, warcBlob(i.toLong, status,
        s"contact admin@example.com or 10.0.0.1 ${texts(i % 20)}"))
    }
    val batch = CrawlStream.frontDoorBatch(blobs.toDF("doc_id", "blob"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch.nonEmpty, "fixture: nothing survived the batch front door")
    // where BOTH duplicates survive the gates, keep-first keeps the
    // smaller id — a larger kept id only appears when its twin was
    // 404/torn/low-quality (batch == stream still pins those cases)
    val keptIds = batch.map(_._1)
    assert(keptIds.exists(_ < 20), "fixture: no small-id survivors at all")
    assert(!(0 until 20).exists(i =>
      keptIds.contains(i.toLong) && keptIds.contains(i + 20L)),
      "a duplicate pair survived dedup")
    val input = MemoryStream[(Long, Array[Byte])]
    val q = CrawlStream.frontDoorStream(input.toDF().toDF("doc_id", "blob"))
      .writeStream.outputMode("append")
      .format("memory").queryName("front_door")
      .start()
    try {
      // per-key in-order: the smaller duplicate ids all arrive in batch 1
      input.addData(blobs.take(20)); q.processAllAvailable()
      input.addData(blobs.drop(20)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("front_door").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }

  test("media ingest twins (20th): streamed decode+gates+keep-first over WAV blobs equals batch x19 flow") {
    import spark.implicits._
    import graft.streaming.MediaIngestStream
    implicit val sctx = spark.sqlContext
    // complete PCM16 WAV bytes (the m5 layout): payload from m, arms
    // for torn / 8 kHz / clipped
    def wavOf(id: Long): Array[Byte] = {
      val m = (id % 13).toInt
      val n = m % 7 + 8
      val sr = if (id % 4 == 0) 8000 else 16000
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
      out.write("RIFF".getBytes); le32(36 + n * 2)
      out.write("WAVEfmt ".getBytes); le32(16); le16(1); le16(1)
      le32(sr); le32(sr * 2); le16(2); le16(16)
      out.write("data".getBytes)
      le32(if (id % 7 == 0) n * 2 + 4 else n * 2) // torn: declared overrun
      (0 until n).foreach { k =>
        val sv = if (id % 6 == 0 && k == n - 1) 32767
          else (m * 31 + k * 17) % 2048 - 1024
        le16(sv & 0xFFFF)
      }
      out.toByteArray
    }
    val wavs = (0L until 40L).map(id => (id, wavOf(id)))
    val batch = MediaIngestStream.ingestBatch(wavs.toDF("doc_id", "wav"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch.nonEmpty, "fixture: nothing survived the batch gates")
    // survivors dedup on the payload class m — duplicates must collapse
    val keptM = batch.map(_._1 % 13)
    assert(keptM.size === batch.size, "a duplicate payload class survived twice")
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaIngestStream.ingestStream(input.toDF().toDF("doc_id", "wav"))
      .writeStream.outputMode("append")
      .format("memory").queryName("media_ingest")
      .start()
    try {
      input.addData(wavs.take(20)); q.processAllAvailable()
      input.addData(wavs.drop(20)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("media_ingest").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }

  test("sitemap discovery twins (19th): streamed parse + stream-static recrawl join equals batch t60 flow") {
    import spark.implicits._
    import graft.streaming.DiscoveryStream
    import org.apache.spark.sql.functions.col
    implicit val sctx = spark.sqlContext
    def xmlOf(id: Long): String = {
      val urls = (1 to 3).map(k =>
        s"<url><loc>https://h${id % 7}.example.com/d$id/p$k</loc>" +
          s"<lastmod>2024-01-${"%02d".format((id + k * 7) % 28 + 1)}</lastmod></url>")
      s"""<?xml version="1.0"?><urlset>${urls.mkString}</urlset>"""
    }
    // doc 30: the middle <url> carries no <lastmod> — it must be
    // SKIPPED, and must NOT shift p3's date onto p2 (the failure mode
    // of pairing two independent document-wide scans positionally)
    // ...and p1's loc carries the entity-escaped ampersand the sitemap
    // protocol REQUIRES — it must unescape before the history join
    val ragged = (30L,
      """<?xml version="1.0"?><urlset>""" +
        "<url><loc>https://r.example.com/p1?a=1&amp;b=2</loc><lastmod>2024-02-10</lastmod></url>" +
        "<url><loc>https://r.example.com/p2</loc></url>" +
        "<url><loc>https://r.example.com/p3</loc><lastmod>2024-02-20</lastmod></url></urlset>")
    val sitemaps = (0L until 30L).map(id => (id, xmlOf(id))) :+ ragged
    // history covers k=1,2 only — k=3 urls are NEW (inner join drops
    // them, exactly the batch behavior the twin must reproduce)
    val history = ((for { id <- 0L until 30L; k <- 1 to 2 } yield (
      s"https://h${id % 7}.example.com/d$id/p$k",
      "2024-01-" + "%02d".format((id * 3 + k * 5) % 28 + 1))) ++ Seq(
      ("https://r.example.com/p1?a=1&b=2", "2024-02-15"), // UNescaped key
      ("https://r.example.com/p2", "2024-02-15"),
      ("https://r.example.com/p3", "2024-02-15")))
      .toDF("url", "last_fetch")
    val batch = DiscoveryStream.recrawlBatch(
        sitemaps.toDF("doc_id", "xml"), history)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSet
    assert(batch.size === 62, "fixture: every (doc, k<=2) url joins once, + p1/p3")
    assert(!batch.exists(_._2 == "https://r.example.com/p2"),
      "an undated url must be skipped, not joined with a shifted date")
    assert(batch.exists(t => t._2 == "https://r.example.com/p1?a=1&b=2" &&
      t._3 == "2024-02-10" && !t._5),
      "p1 unescapes &amp; and pairs with ITS lastmod (stale)")
    assert(batch.exists(t => t._2 == "https://r.example.com/p3" &&
      t._3 == "2024-02-20" && t._5), "p3 pairs with ITS lastmod (refetch)")
    assert(batch.exists(_._5) && batch.exists(!_._5),
      "fixture: both refetch outcomes live")
    val input = MemoryStream[(Long, String)]
    val q = DiscoveryStream.recrawlStream(
        input.toDF().toDF("doc_id", "xml"), history)
      .writeStream.outputMode("append")
      .format("memory").queryName("discovery")
      .start()
    try {
      input.addData(sitemaps.take(12)); q.processAllAvailable()
      input.addData(sitemaps.drop(12)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("discovery").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSet
    assert(streamed === batch)
  }

  test("document ingest twins (21st): streamed zstd -> pdf_text -> gate -> keep-first equals batch x22 flow") {
    import spark.implicits._
    import graft.streaming.DocumentIngestStream
    implicit val sctx = spark.sqlContext
    // one-page classic-xref PDF (straight-line builder, independent of
    // the engine's parser) holding one Tj line
    def pdfOf(text: String): Array[Byte] = {
      val c = s"BT ($text) Tj ET".getBytes("ISO-8859-1")
      val out = new java.io.ByteArrayOutputStream()
      val offs = scala.collection.mutable.ArrayBuffer[Int]()
      out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
      def obj(n: Int, body: String): Unit = {
        offs += out.size()
        out.write(s"$n 0 obj\n$body\nendobj\n".getBytes("ISO-8859-1"))
      }
      obj(1, "<</Type /Catalog /Pages 2 0 R>>")
      obj(2, "<</Type /Pages /Kids [3 0 R] /Count 1>>")
      obj(3, "<</Type /Page /Parent 2 0 R /Contents 4 0 R>>")
      offs += out.size()
      out.write(s"4 0 obj\n<</Length ${c.length}>>\nstream\n".getBytes("ISO-8859-1"))
      out.write(c)
      out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      val xrefAt = out.size()
      out.write(("xref\n0 5\n0000000000 65535 f \n" +
        offs.map(o => f"$o%010d 00000 n \n").mkString +
        s"trailer\n<</Size 5 /Root 1 0 R>>\nstartxref\n$xrefAt\n%%EOF\n")
        .getBytes("ISO-8859-1"))
      out.toByteArray
    }
    def zst(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      z.setChecksum(true); z.write(b); z.close()
      bos.toByteArray
    }
    val blobs: Seq[(Long, Array[Byte])] = (0L until 40L).map { id =>
      val cls = id % 5
      // short-doc arm (id%4): 2 tokens, below the 7-token floor
      val text = if (id % 4 == 0) s"doc $cls"
        else s"doc $cls alpha beta gamma delta here"
      val z = zst(pdfOf(text))
      // torn-frame arm (id%7): zunstd must refuse, quarantine by absence
      (id, if (id % 7 == 0) z.dropRight(3) else z)
    }
    val batch = DocumentIngestStream.ingestBatch(blobs.toDF("doc_id", "blob"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // survivors: id%7 != 0 and id%4 != 0; one kept doc per content class
    assert(batch.size === 5, s"expected 5 content classes, got ${batch.size}")
    assert(batch.map(_._1).forall(id => id % 7 != 0 && id % 4 != 0))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = DocumentIngestStream.ingestStream(
        input.toDF().toDF("doc_id", "blob"))
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_ingest")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-doc-ckpt").toString)
      .start()
    try {
      input.addData(blobs.take(20)); q.processAllAvailable()
      input.addData(blobs.drop(20)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("doc_ingest").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }

  test("mixed-container ingest twins (22nd): five codecs, one magic-routed flow equals batch") {
    import spark.implicits._
    import graft.streaming.MixedMirrorStream
    implicit val sctx = spark.sqlContext
    // each class's text travels in a DIFFERENT container per doc —
    // library encoders, one per codec (gzip via the JDK, the rest via
    // the classpath libraries the decoders wrap)
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos); o.write(b); o.close()
      bos.toByteArray
    }
    def zst(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new com.github.luben.zstd.ZstdOutputStream(bos); o.write(b); o.close()
      bos.toByteArray
    }
    def xz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new org.tukaani.xz.XZOutputStream(bos,
        new org.tukaani.xz.LZMA2Options(), org.tukaani.xz.XZ.CHECK_CRC32)
      o.write(b); o.close()
      bos.toByteArray
    }
    def bz2(b: Array[Byte]) = graft.functions.Bzip2Deflate.deflate(b)
    def lz4(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new net.jpountz.lz4.LZ4FrameOutputStream(bos); o.write(b); o.close()
      bos.toByteArray
    }
    val wraps = Seq(gz _, zst _, xz _, bz2 _, lz4 _)
    val blobs: Seq[(Long, Array[Byte])] = (0L until 40L).map { id =>
      val cls = id % 5
      // short-doc arm (id%4): 2 tokens, below the 4-token floor
      val text = if (id % 4 == 0) s"doc $cls"
        else s"doc $cls mirrored corpus text here"
      val z = wraps(((id + cls) % 5).toInt)(text.getBytes("UTF-8"))
      // torn arm (id%7): every decoder refuses, one quarantine contract
      (id, if (id % 7 == 0) z.dropRight(3) else z)
    }
    val batch = MixedMirrorStream.ingestBatch(blobs.toDF("doc_id", "blob"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch.size === 5, s"expected 5 content classes, got ${batch.size}")
    assert(batch.map(_._1).forall(id => id % 7 != 0 && id % 4 != 0))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MixedMirrorStream.ingestStream(
        input.toDF().toDF("doc_id", "blob"))
      .writeStream.outputMode("append")
      .format("memory").queryName("mixed_ingest")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-mixed-ckpt").toString)
      .start()
    try {
      input.addData(blobs.take(20)); q.processAllAvailable()
      input.addData(blobs.drop(20)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mixed_ingest").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }

  test("lexical ingest twins (15th): streamed appendSaved equals batch-built BM25, scores included") {
    import spark.implicits._
    import graft.operators.InvertedIndex
    import graft.streaming.LexIngestStream
    import org.apache.spark.sql.functions.col
    implicit val sctx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val extra = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val pathA = Files.createTempDirectory("graft-lex-batch").toString + "/idx"
    val pathB = Files.createTempDirectory("graft-lex-stream").toString + "/idx"
    InvertedIndex.save(base, "doc_id", "text", pathA, buckets = 8)
    InvertedIndex.save(base, "doc_id", "text", pathB, buckets = 8)
    // batch path: one appendSaved of the held-out slice
    InvertedIndex.appendSaved(extra.toDF("doc_id", "text"), "doc_id", "text", pathA)
    // stream path: the same docs across two micro-batches
    val input = MemoryStream[(Long, String)]
    val q = LexIngestStream.ingest(input.toDF().toDF("doc_id", "text"), pathB,
      "doc_id", "text", Files.createTempDirectory("graft-lex-ckpt").toString)
    try {
      input.addData(extra.take(extra.length / 2)); q.processAllAvailable()
      input.addData(extra.drop(extra.length / 2)); q.processAllAvailable()
    } finally q.stop()
    val terms = Seq("spark", "join", "fast", "window")
    def hits(path: String) = InvertedIndex.searchSaved(spark, path, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the index cannot tell how its postings arrived — scores included
    assert(hits(pathB) === hits(pathA))
    // and both equal a from-scratch build over the whole corpus
    val pathC = Files.createTempDirectory("graft-lex-fresh").toString + "/idx"
    InvertedIndex.save(docs, "doc_id", "text", pathC, buckets = 8)
    assert(hits(pathB) === hits(pathC))
    // the operational price is segment accretion; the COMPOSED lifecycle
    // closes as one sequence — ingest accreted segments, telemetry sees
    // them, the POLICY flags exactly the multi-segment buckets, the
    // rewrite acts on all of them in one run, and serving cannot tell:
    assert(InvertedIndex.segmentStats(spark, pathB)
      .agg(org.apache.spark.sql.functions.max(col("n_files"))).head().getLong(0) > 1L)
    val plan = InvertedIndex.compactionPlan(spark, pathB, maxFiles = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(3))).toSeq
    plan.foreach { case (tb, nf, c) =>
      assert(c === (nf > 1L), s"bucket $tb: $nf files flagged $c") }
    val flaggedN = plan.count(_._3)
    assert(flaggedN >= 2, s"stream accretion should flag several buckets, got $flaggedN")
    val compacted = InvertedIndex.compactSaved(spark, pathB, maxFiles = 1)
    assert(compacted === flaggedN)
    assert(InvertedIndex.segmentStats(spark, pathB)
      .agg(org.apache.spark.sql.functions.max(col("n_files"))).head().getLong(0) === 1L)
    // scores-included equality with the fresh build, post-compaction
    assert(hits(pathB) === hits(pathC))
  }
}
