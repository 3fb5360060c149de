package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlKernel
import graft.operators.Curate

class UrlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def canon(u: String): String = {
    val r = UrlKernel.canonicalize(org.apache.spark.unsafe.types.UTF8String.fromString(u))
    if (r == null) null else r.toString
  }
  private def host(u: String): String = {
    val r = UrlKernel.host(org.apache.spark.unsafe.types.UTF8String.fromString(u))
    if (r == null) null else r.toString
  }

  test("canonicalize: case, default ports, fragments, dot segments (RFC 3986 §6.2)") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/../c/./d?q=1#frag") ===
      "https://www.example.com/a/c/d?q=1")
    assert(canon("http://Host.com:80/") === "http://host.com/")
    // non-default port survives; http's default stripped only for http
    assert(canon("http://host.com:8080/x") === "http://host.com:8080/x")
    assert(canon("https://host.com:80/x") === "https://host.com:80/x")
    // empty path with authority -> "/"
    assert(canon("https://host.com") === "https://host.com/")
    // query passes byte-for-byte, even empty; fragment always dropped
    assert(canon("https://h.com/p?") === "https://h.com/p?")
    assert(canon("https://h.com/p#only-frag") === "https://h.com/p")
    // userinfo preserved as-is (case-sensitive by spec)
    assert(canon("ftp://User:Pw@Host.com/Dir/") === "ftp://User:Pw@host.com/Dir/")
    // percent-encodings untouched (we skip §6.2.2.2 by design)
    assert(canon("https://h.com/a%2Fb?x=%20") === "https://h.com/a%2Fb?x=%20")
  }

  test("canonicalize: dot-segment edge cases") {
    assert(canon("https://h.com/a/b/..") === "https://h.com/a/")
    assert(canon("https://h.com/a/.") === "https://h.com/a/")
    assert(canon("https://h.com/../../x") === "https://h.com/x")
    assert(canon("https://h.com/a//b") === "https://h.com/a/b")
    assert(canon("https://h.com/..") === "https://h.com/")
  }

  test("canonicalize: IPv6 literals keep their brackets; port logic uses the bracket end") {
    assert(canon("http://[2001:DB8::7]:80/p") === "http://[2001:db8::7]/p")
    assert(canon("https://[::1]:8443/p") === "https://[::1]:8443/p")
    assert(host("https://[::1]:8443/p") === "[::1]")
  }

  test("junk quarantines to NULL") {
    for (bad <- Seq("not a url", "://nohost", "http://", "http://host:port/x",
        "http://[::1", "1http://h.com/")) {
      assert(canon(bad) === null, s"'$bad' must not canonicalize")
      assert(host(bad) === null)
    }
  }

  test("domainCap: per-host cap in deterministic hash order, junk dropped, append-stable") {
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (i, s"https://HOST${i % 3}.com/p$i")) ++
      Seq((99L, "junk-url"))).toDF("id", "url")
    val kept = Curate.domainCap(docs, "id", "url", maxPerHost = 4)
    val rows = kept.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 12) // 3 hosts x 4
    assert(rows.forall(_._1.startsWith("host")))
    assert(rows.forall(_._4.startsWith("https://host")))
    // deterministic: same selection under a different partitioning
    val rows7 = Curate.domainCap(docs.repartition(7), "id", "url", maxPerHost = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows7 === rows.map(r => (r._1, r._2, r._3)).toSet)
    // append-stable: adding rows never evicts differently than the
    // hash order implies — the kept set of the smaller corpus is the
    // hash-prefix of each host's ordering, so re-capping the union
    // still ranks the original winners by the same pure hash function
    val more = docs.union(Seq((100L, "https://HOST0.com/new")).toDF("id", "url"))
    val reRanked = Curate.domainCap(more, "id", "url", maxPerHost = 4)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val before = rows.map(r => (r._1, r._3)).toSet
    // at most one slot per host can change, and only on host0
    assert((before -- reRanked).forall(_._1 == "host0.com"))
    assert((before -- reRanked).size <= 1)
  }
}
