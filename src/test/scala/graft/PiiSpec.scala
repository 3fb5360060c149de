package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

class PiiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def scrubOne(s: String): (Long, Long, Long, String) = {
    val r = Pii.scrub(Seq((1L, s)).toDF("id", "text"), "text")
      .select("n_email", "n_ip", "n_phone", "redacted").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("each rule redacts its class; clean text passes through untouched") {
    assert(scrubOne("mail a.b+c@x-y.co now") === ((1L, 0L, 0L, "mail <EMAIL> now")))
    assert(scrubOne("host 192.168.0.1 up") === ((0L, 1L, 0L, "host <IP> up")))
    assert(scrubOne("call +555-123-4567 ok") === ((0L, 0L, 1L, "call <PHONE> ok")))
    assert(scrubOne("call 555 123 4567 ok") === ((0L, 0L, 1L, "call <PHONE> ok")))
    assert(scrubOne("plain words only") === ((0L, 0L, 0L, "plain words only")))
  }

  test("stage order is load-bearing: an IPv4 email host is an email, not an IP") {
    // user@1.2.3.4 does NOT match the email rule (no alphabetic TLD), so
    // the IP stage catches the host — the '@' survives
    assert(scrubOne("u@1.2.3.4 x") === ((0L, 1L, 0L, "u@<IP> x")))
    // but a real email containing digits is consumed whole by stage 1
    assert(scrubOne("u1@m2.org and 10.0.0.1") === ((1L, 1L, 0L, "<EMAIL> and <IP>")))
  }

  test("word boundaries: digit runs inside longer tokens are not IPs") {
    assert(scrubOne("v1.2.3.4x stays") === ((0L, 0L, 0L, "v1.2.3.4x stays")))
    assert(scrubOne("exactly 1.2.3.4 bounded") === ((0L, 1L, 0L, "exactly <IP> bounded")))
  }

  test("multiple matches all redact and all count") {
    val (e, i, p, red) = scrubOne("a@b.io c@d.org 1.1.1.1 2.2.2.2 111-222-3333")
    assert((e, i, p) === ((2L, 2L, 1L)))
    assert(red === "<EMAIL> <EMAIL> <IP> <IP> <PHONE>")
  }
}
