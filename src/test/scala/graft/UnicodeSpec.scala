package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.nfc_normalize

class UnicodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // explicit escapes throughout: literal accents in source would be at
  // the mercy of editor/tool normalization, exactly the failure mode
  // under test
  private val combining = "café"   // e + combining acute
  private val precomposed = "café"  // U+00E9

  test("NFC: combining pair composes to the precomposed form; ASCII is identity") {
    assert(combining !== precomposed) // the fixture really is denormalized
    val rows = Seq(
      (1L, combining),
      (2L, precomposed),
      (3L, "plain ascii text"),
      (4L, "Ångström") // ring + diaeresis -> U+00C5, U+00F6
    ).toDF("id", "s")
    val got = rows.select($"id", nfc_normalize($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === got(2L))
    assert(got(1L) === precomposed)
    assert(got(3L) === "plain ascii text")
    assert(got(4L) === "Ångström")
    // equal AFTER normalization -> identical fingerprints downstream
    val fps = rows.filter($"id" <= 2)
      .select(md5(nfc_normalize($"s").cast("binary"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("NFC: null passes through; SQL registration works") {
    val df = Seq((1L, null: String)).toDF("id", "s")
    assert(df.select(nfc_normalize($"s")).head().isNullAt(0))
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('café') AS n")
      .head().getString(0) === precomposed)
  }
}
