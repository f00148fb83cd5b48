package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl($"url")).as[String].collect().toSeq

  test("canonicalizeUrl collapses equivalent spellings") {
    val Seq(a, b, c, d, e, f) = canon(
      "https://Example.COM/a/?b=2&a=1&utm_source=x",
      "https://example.com:443/a?a=1&b=2#frag",
      "https://www.example.com/a/?a=1&gclid=abc&b=2",
      "https://example.com/a?utm_medium=y&b=2&a=1",
      "http://example.com:80/a?a=1&b=2",
      "http://example.com/a/?b=2&a=1&fbclid=z")
    assert(Seq(b, c, d).forall(_ == a), s"same page must collapse: $a $b $c $d")
    assert(a == "https://example.com/a?a=1&b=2")
    assert(e == f && e == "http://example.com/a?a=1&b=2")
    assert(a != e, "scheme is part of the page identity")
  }

  test("canonicalizeUrl preserves genuine distinctions") {
    val Seq(base, port, pathCase, value, deep, rootA, rootB) = canon(
      "https://example.com/a?a=1",
      "https://example.com:8443/a?a=1", // non-default port survives
      "https://example.com/A?a=1",      // path case is significant
      "https://example.com/a?a=2",      // param value is significant
      "https://example.com/a/b?a=1",    // deeper path
      "https://example.com",            // empty path → /
      "https://example.com///")         // slash runs trim to /
    assert(Seq(port, pathCase, value, deep).forall(_ != base))
    assert(port.endsWith(":8443/a?a=1"))
    assert(rootA == "https://example.com/" && rootB == rootA)
  }

  test("urlDedup keeps one min-id survivor per canonical URL") {
    val df = Seq(
      (1L, "https://Example.COM/x/?utm_source=a"),
      (2L, "https://example.com/x"),
      (3L, "https://www.example.com/x#top"),
      (4L, "https://example.com/y")).toDF("doc_id", "url")
    val out = Urls.urlDedup(df, "doc_id", "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "https://example.com/x" -> (1L, 3L),
      "https://example.com/y" -> (4L, 1L)))
  }

  test("domainFilter drops blocked domains and their subdomains, " +
    "keeps siblings and superstrings") {
    val df = Seq(
      (1L, "https://bad.com/a"),            // exact blocked apex
      (2L, "https://Ads.BAD.com:8443/b"),   // subdomain + case + port
      (3L, "https://notbad.com/c"),         // superstring is NOT a subdomain
      (4L, "https://bad.com.evil.org/d"),   // blocked apex mid-host is fine
      (5L, "https://good.com/e")).toDF("doc_id", "url")
    val blocked = Seq("bad.com").toDF("domain")
    val out = Urls.domainFilter(df, "doc_id", "url", blocked)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L, 4L, 5L))
    val hosts = out.select("host").as[String].collect().toSet
    assert(hosts == Set("notbad.com", "bad.com.evil.org", "good.com"),
      s"host is lowercased and port-stripped: $hosts")
  }
}
