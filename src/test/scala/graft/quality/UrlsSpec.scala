package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.normalize($"url")).as[String].collect().toSeq

  test("normalize: case, default ports, fragments, tracking params") {
    assert(norm(
      "HTTPS://WWW.Example.ORG:443/A/b?utm_source=x&id=7#frag",
      "https://example.org/p",
      "http://example.org:80/p?a=1",
      "https://example.org:8080/p?gclid=z&a=1&utm_campaign=c&b=2",
      "https://example.org/p?utm_source=only"
    ) == Seq(
      // :443 is the https default → dropped; case folds; fragment drops
      "https://www.example.org/A/b?id=7",
      "https://example.org/p",
      // :80 is the http default → dropped
      "http://example.org/p?a=1",
      // :8080 explicit → kept; surviving params keep their order
      "https://example.org:8080/p?a=1&b=2",
      // nothing survives → no '?'
      "https://example.org/p"))
  }

  test("normalize is idempotent and merges presentation variants") {
    val variants = Seq(
      "https://Example.org/p?id=1",
      "HTTPS://example.ORG:443/p?utm_medium=m&id=1#x")
    val normed = norm(variants: _*)
    assert(normed.distinct == Seq("https://example.org/p?id=1"))
    assert(norm(normed: _*) == normed)
  }

  test("host and domain extraction") {
    val row = Seq("https://a.b.News.Example.COM:8443/x?q=1")
      .toDF("url")
      .select(Urls.host($"url"), Urls.domain($"url"))
      .as[(String, String)].head()
    assert(row == ("a.b.news.example.com", "example.com"))
  }

  test("blocklistFilter: blocked domains and URL patterns drop, rest survive") {
    val urls = Seq(
      (1L, "https://news.example.com/a?id=1"),          // clean
      (2L, "https://Sub.SPAM.co.uk/x"),                 // blocked domain (PSL)
      (3L, "https://ok.org/p?utm_campaign=z&id=3"),     // blocked pattern
      (4L, "https://spam.com/y"),                       // blocked domain
      (5L, "https://fine.net/p?utm_source=feed")        // pattern near-miss
    ).toDF("id", "url")
    val block = Seq("spam.co.uk", "spam.com")
    val inl = Urls.blocklistFilter(urls, "url", block, "(?i)utm_campaign")
      .select($"id").as[Long].collect().toSet
    assert(inl == Set(1L, 5L))
    // over maxInline the same semantics run as a broadcast anti-join
    val joined = Urls.blocklistFilter(urls, "url", block,
      "(?i)utm_campaign", maxInline = 1)
    assert(joined.select($"id").as[Long].collect().toSet == Set(1L, 5L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(600))
  }

  test("domainCap keeps top-k per domain with deterministic tiebreak") {
    val df = Seq(
      // domain d1: scores 5,5,3 with ids 2,1,3 — tie prefers lower id
      ("d1", 1L, 5L), ("d1", 2L, 5L), ("d1", 3L, 3L),
      ("d2", 4L, 9L)
    ).toDF("domain", "id", "score")
    val kept = Urls.domainCap(df, "domain", "score", "id", cap = 2)
      .select($"domain", $"id").as[(String, Long)].collect().toSet
    assert(kept == Set(("d1", 1L), ("d1", 2L), ("d2", 4L)))
  }
}
