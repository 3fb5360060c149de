package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.streaming.EventsStream
import graft.streaming.EventsStream.Event

/** Adversarial-lateness properties for the streaming twins (round-10
  * verdict task 7): RANDOMIZED event streams — random timestamps, users,
  * types, exact-duplicate re-deliveries — delivered in a RANDOM order
  * across several micro-batches, must produce exactly the batch
  * operator's result over the same multiset, as long as the disorder
  * stays within the declared watermark (the streaming contract; drops
  * BEYOND the watermark are pinned separately by the fixed-fixture
  * "drops too-late events" spec).
  *
  * The watermark here is set far wider than the generated time span, so
  * EVERY generated delivery order is within-contract — the property
  * quantifies over arrival adversaries, not over drop behavior. Each
  * case spins a real MemoryStream query, so minSuccessfulTests is kept
  * small; the generator seeds vary per run.
  */
object StreamingLatenessProperties extends Properties("graft.streaming.lateness") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(4).withWorkers(1)

  private lazy val spark = SparkTestSession.spark
  private val nameCounter = new AtomicInteger(0)

  private val Base = 1767225600000L // 2026-01-01T00:00:00Z
  private val SpanMinutes = 180L    // all real events inside 3 hours
  private val Watermark = "240 hours" // >> span: any order is in-contract

  /** A randomized stream: base events in the span, a random subset
    * re-delivered as exact duplicates, the whole multiset shuffled and
    * cut into delivery chunks (micro-batches).
    */
  private case class Case(chunks: Seq[Seq[Event]], all: Seq[Event])

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(30, 70)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 500L)
      offMin <- Gen.choose(0L, SpanMinutes)
      uid <- Gen.choose(1L, 4L)
      tpe <- Gen.oneOf("click", "purchase", "view")
      v <- Gen.choose(0.0, 10.0)
    } yield Event(id, new Timestamp(Base + offMin * 60000L), uid, tpe, v, "{}"))
    dups <- Gen.someOf(evs) // exact re-deliveries (at-least-once sources)
    nChunks <- Gen.choose(2, 5)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val all = evs ++ dups
    val shuffled = new scala.util.Random(seed).shuffle(all)
    val size = math.max(1, (shuffled.length + nChunks - 1) / nChunks)
    Case(shuffled.grouped(size).toSeq, all)
  }

  /** Run `twin` over the case's chunked deliveries (plus `sentinels`
    * appended as a final chunk to advance the watermark), return the
    * memory-sink rows.
    */
  private def runStream(c: Case, sentinels: Seq[Event],
                        twin: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[Event]
    val name = s"lateness_out_${nameCounter.incrementAndGet()}"
    val q = twin(input.toDS().toDF())
      .writeStream.outputMode(mode).format("memory").queryName(name).start()
    try {
      c.chunks.foreach { ch => input.addData(ch); q.processAllAvailable() }
      if (sentinels.nonEmpty) { input.addData(sentinels); q.processAllAvailable() }
      spark.table(name)
    } finally q.stop()
  }

  private def batchDf(c: Case): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.createDataset(c.all).toDF()
  }

  // far enough that watermark (sentinel - 240h) clears every session
  // close / join window of the real span
  private def sentinelTs(h: Long): Timestamp =
    new Timestamp(Base + SpanMinutes * 60000L + (240L + h) * 3600000L)

  property("e16 session windows: any in-watermark order + duplicates == batch") =
    forAll(genCase) { c =>
      val sentinel = Seq(Event(999999999L, sentinelTs(1), 99L, "view", 0.0, "{}"))
      val streamed = runStream(c, sentinel,
        df => EventsStream.sessionWindowsStream(df, watermark = Watermark), "append")
        .filter(col("user_id") < 99L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSeq.sorted
      val batch = EventsStream.sessionWindowsBatch(batchDf(c))
        .withColumn("sess_start", col("sess_start").cast("timestamp"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSeq.sorted
      Prop(streamed == batch && batch.nonEmpty) :| s"streamed=$streamed batch=$batch"
    }

  property("e19 HLL registers: any order + duplicates == batch sketch") =
    forAll(genCase) { c =>
      val streamed = runStream(c, Seq.empty,
        EventsStream.hllRegistersStream, "complete")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSeq.sorted
      val batch = graft.operators.Hll.registers(
        batchDf(c), Seq("event_type"), col("user_id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSeq.sorted
      Prop(streamed == batch && batch.nonEmpty) :| s"streamed=$streamed batch=$batch"
    }

  property("e21 SCD2 twin: random per-key-in-order interleavings + duplicates == batch closed intervals") =
    forAll(genCase) { c =>
      // the documented contract: per-key order holds (the Kafka regime),
      // keys interleave arbitrarily, exact duplicates may re-deliver.
      // Rebuild the delivery from the case's multiset: per-user sorted
      // streams, merged by repeatedly popping a random non-empty user,
      // then chunked.
      val byUser = c.all.groupBy(_.user_id).view
        .mapValues(_.sortBy(e => (e.ts.getTime, e.event_id)).toBuffer).toMap
      val rnd = new scala.util.Random(c.all.length * 2654435761L)
      val merged = scala.collection.mutable.Buffer.empty[Event]
      val users = byUser.keys.toArray
      while (merged.length < c.all.length) {
        val live = users.filter(u => byUser(u).nonEmpty)
        val u = live(rnd.nextInt(live.length))
        merged += byUser(u).remove(0)
      }
      val size = math.max(1, merged.length / 4)
      val inOrder = Case(merged.toSeq.grouped(size).toSeq, c.all)
      val streamed = runStream(inOrder, Seq.empty,
        df => {
          import df.sparkSession.implicits._
          EventsStream.scd2Stream(df.as[Event]).toDF()
        }, "append")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
      val batch = {
        import org.apache.spark.sql.functions.{lag => flag, lead => flead, _}
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        batchDf(c)
          .withColumn("prev", flag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to", unix_micros(flead(col("ts"), 1).over(w)))
          .filter(col("valid_to").isNotNull)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")), col("valid_to"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getLong(3), r.getLong(4))).toSeq.sorted
      }
      Prop(streamed == batch) :| s"streamed=$streamed batch=$batch"
    }

  property("e20 attribution gaps: any in-watermark order + duplicates == batch outer join") =
    forAll(genCase) { c =>
      // sentinels must BE a click and a purchase (each side's watermark
      // advances independently); distinct users keep them from joining
      val sentinels = Seq(
        Event(999999999L, sentinelTs(1), 98L, "click", 0.0, "{}"),
        Event(999999998L, sentinelTs(2), 99L, "purchase", 0.0, "{}"))
      val streamed = runStream(c, sentinels,
        df => EventsStream.attributionGapsStream(df, watermark = Watermark), "append")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .filter(_._1 < 999999000L).toSeq.sorted
      val batch = EventsStream.attributionGapsBatch(batchDf(c))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSeq.sorted
      Prop(streamed == batch) :| s"streamed=$streamed batch=$batch"
    }
}
