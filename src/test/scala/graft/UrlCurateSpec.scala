package graft

import org.apache.spark.sql.functions._

import graft.text.UrlCurate

class UrlCurateSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlCurate.canonicalUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0)).orNull).toSeq

  test("canonicalUrl: case, www, default ports, fragments, trailing slashes") {
    assert(canon("HTTP://WWW.Example.COM/Path/") === Seq("http://example.com/Path"))
    assert(canon("https://example.com:443/a") === Seq("https://example.com/a"))
    assert(canon("http://example.com:80/a") === Seq("http://example.com/a"))
    assert(canon("http://example.com:8080/a") === Seq("http://example.com:8080/a"))
    assert(canon("https://example.com:80/a") === Seq("https://example.com:80/a"),
      "80 is only default for http")
    assert(canon("http://example.com/a#frag") === Seq("http://example.com/a"))
    assert(canon("http://example.com/") === Seq("http://example.com"))
    assert(canon("http://example.com") === Seq("http://example.com"))
    // path CASE is preserved (paths are case-sensitive per RFC 3986)
    assert(canon("http://example.com/CaseSensitive") === Seq("http://example.com/CaseSensitive"))
    assert(canon("not a url") === Seq(null))
  }

  test("canonicalUrl: tracking params dropped, rest sorted; exact-name semantics") {
    assert(canon("http://e.com/p?utm_source=x&id=1&utm_medium=y")
      === Seq("http://e.com/p?id=1"))
    assert(canon("http://e.com/p?b=2&a=1") === Seq("http://e.com/p?a=1&b=2"))
    assert(canon("http://e.com/p?fbclid=abc&gclid=1&ref=tw")
      === Seq("http://e.com/p"))
    // `ref` is dropped exactly; `referrer_policy` is NOT a tracking param
    assert(canon("http://e.com/p?referrer_policy=strict&ref=x")
      === Seq("http://e.com/p?referrer_policy=strict"))
    // empty query and bare ? collapse
    assert(canon("http://e.com/p?") === Seq("http://e.com/p"))
  }

  test("canonicalUrl equates the same page fetched through tracking noise") {
    val forms = Seq(
      "http://www.example.com/article/42?utm_source=feed",
      "HTTP://example.com/article/42/",
      "http://example.com:80/article/42#top",
      "http://example.com/article/42?utm_medium=a&utm_campaign=b")
    assert(canon(forms: _*).distinct === Seq("http://example.com/article/42"))
  }

  test("registeredDomain: two labels, two-level TLDs, IPs, single labels") {
    val got = Seq("a.b.example.com", "example.com", "sub.example.co.uk",
      "example.co.uk", "localhost", "10.0.0.1", "deep.sub.site.com.au")
      .toDF("h").select(UrlCurate.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.com", "example.com", "example.co.uk",
      "example.co.uk", "localhost", "10.0.0.1", "site.com.au"))
  }

  test("dedupByCanonicalUrl keeps min-id per canonical form; non-URLs all survive") {
    val df = Seq(
      (1L, "http://www.e.com/x?utm_source=a"),
      (2L, "http://e.com/x/"),
      (3L, "http://e.com/y"),
      (4L, "junk"),
      (5L, "junk")).toDF("id", "url")
    val kept = UrlCurate.dedupByCanonicalUrl(df, "url", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L, 4L, 5L))
  }

  test("capPerDomain: deterministic bottom-N by md5, partition-invariant") {
    val df = (1L to 40L).map { i =>
      val host = if (i <= 30) "big.example.com" else s"small$i.org"
      (i, s"http://$host/p/$i")
    }.toDF("id", "url")
    val kept = UrlCurate.capPerDomain(df, "url", "id", maxPerDomain = 5)
    val byDomain = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("example.com") === 5L)
    assert(byDomain.filter(_._1 != "example.com").values.forall(_ === 1L))
    // determinism: same kept ids regardless of partitioning
    val ids1 = kept.select("id").as[Long].collect().sorted.toSeq
    val ids2 = UrlCurate.capPerDomain(df.repartition(13), "url", "id", 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
  }
}
