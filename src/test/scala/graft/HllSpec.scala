package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hll

class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("registers are bounded and mergeable: max-merge of halves equals the full sketch") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i % 2, i)).toDF("half", "v")
    val full = Hll.registers(df, Seq.empty, col("v"))
    val bounds = full.filter(col("bucket") < 0 || col("bucket") > 255 ||
      col("max_rho") < 1 || col("max_rho") > 57)
    assert(bounds.isEmpty)
    // shard by half, sketch each, merge with the same max aggregate
    val halves = Hll.registers(df, Seq("half"), col("v"))
    val merged = halves.groupBy("bucket").agg(max("max_rho").as("max_rho"))
    val a = full.orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val b = merged.orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(a === b)
  }

  test("merge: union-max of disjoint and overlapping shards equals one pass") {
    import spark.implicits._
    val df = (1L to 9000L).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val full = Hll.registers(df, Seq("k"), col("v"))
      .orderBy("k", "bucket").collect().toSeq
    // disjoint split
    val a = Hll.registers(df.filter(col("v") % 2 === 0), Seq("k"), col("v"))
    val b = Hll.registers(df.filter(col("v") % 2 =!= 0), Seq("k"), col("v"))
    val m1 = Hll.merge(Seq("k"), Seq(a, b)).orderBy("k", "bucket").collect().toSeq
    assert(m1 === full)
    // overlapping split (rows 1..6000 and 3001..9000): max of maxes
    val c = Hll.registers(df.filter(col("v") <= 6000), Seq("k"), col("v"))
    val e = Hll.registers(df.filter(col("v") > 3000), Seq("k"), col("v"))
    val m2 = Hll.merge(Seq("k"), Seq(c, e)).orderBy("k", "bucket").collect().toSeq
    assert(m2 === full)
  }

  test("estimate is within the p=8 error envelope on known cardinalities") {
    import spark.implicits._
    for (n <- Seq(500L, 5000L, 50000L)) {
      val df = (1L to n).map(i => Tuple1(i * 2654435761L)).toDF("v")
      val est = Hll.estimate(Hll.registers(df, Seq.empty, col("v")), Seq.empty)
        .collect().head.getAs[Double]("estimate")
      // standard error 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("estimate tracks exact distinct per event_type on the corpus") {
    val ev = Tables.events(spark, sfDir)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Hll.estimate(
      Hll.registers(ev, Seq("event_type"), col("user_id")), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate")).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k).toDouble
      assert(math.abs(e - x) / x < 0.3, s"$k exact=$x est=$e")
    }
  }

  test("duplicates never change the sketch (distinctness by construction)") {
    import spark.implicits._
    val once = (1L to 3000L).map(Tuple1(_)).toDF("v")
    val thrice = ((1L to 3000L) ++ (1L to 3000L) ++ (1L to 3000L))
      .map(Tuple1(_)).toDF("v")
    val a = Hll.registers(once, Seq.empty, col("v")).orderBy("bucket").collect().toSeq
    val b = Hll.registers(thrice, Seq.empty, col("v")).orderBy("bucket").collect().toSeq
    assert(a === b)
  }

  test("e28b: windowed register rollup equals a direct sketch of each window; estimate tracks the exact trailing distinct") {
    import spark.implicits._
    import java.sql.Timestamp
    // 10 days, day i has users [100*i, 100*i + 400) — windows overlap
    // heavily so trailing distinct differs strongly from daily distinct
    val rnd = new scala.util.Random(3)
    val rows = for {
      day <- 0 until 10
      u <- (100 * day) until (100 * day + 400)
    } yield (Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"),
      u.toLong + (rnd.nextInt(2) * 0L)) // rnd kept for future jitter; ids exact
    val ev = rows.toDF("ts", "user_id")
    val rolled = graft.operators.Rolling.rollingHllRegisters(
      ev, col("ts"), col("user_id"), windowDays = 7)
    // rollup == direct sketch of each trailing window (max of maxes)
    val direct = {
      val du = ev.select(date_trunc("day", col("ts")).as("d"), col("user_id"))
      val days = du.select(col("d")).distinct()
      days.collect().map(_.getTimestamp(0)).map { rd =>
        val lo = new Timestamp(rd.getTime - 6L * 86400000L)
        Hll.registers(du.filter(col("d") >= lit(lo) && col("d") <= lit(rd)),
          Seq.empty, col("user_id"))
          .withColumn("day_us", lit(rd.getTime * 1000L))
          .select("day_us", "bucket", "max_rho")
      }.reduce(_ unionAll _)
    }
    val got = rolled.orderBy("day_us", "bucket").collect().toSeq
    assert(got === direct.orderBy("day_us", "bucket").collect().toSeq)
    // derived estimate within the p=8 envelope of the EXACT trailing
    // distinct (the number e28 computes)
    val exact = graft.operators.Rolling.rollingDistinctDaily(
      ev, col("ts"), col("user_id"), windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dau_w")).toMap
    val est = Hll.estimate(rolled, Seq("day_us"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("estimate")).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (day, e) =>
      val x = exact(day).toDouble
      assert(math.abs(e - x) / x < 0.25, s"day_us=$day exact=$x est=$e")
    }
  }
}
