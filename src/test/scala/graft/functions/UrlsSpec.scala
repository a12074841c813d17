package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize($"u").as("c"))
      .collect().head.getString(0)

  test("canonicalize applies the full crawl-dedup rule set") {
    // fragment, case, www, default port, tracking params, param sort,
    // trailing slash — all at once
    assert(canon("HTTPS://WWW.Site.COM:443/a/b/?b=2&utm_source=x&a=1#f")
      === "https://site.com/a/b?a=1&b=2")
    assert(canon("http://EXAMPLE.org:80/path") === "http://example.org/path")
    // non-default port survives
    assert(canon("https://site.com:8443/x") === "https://site.com:8443/x")
    // gclid/fbclid stripped; ref SURVIVES the default set (it is
    // commonly semantic — ?ref=branch selects content; r16 ADVICE)
    assert(canon("https://a.io/p?gclid=1&fbclid=2&ref=h&q=v")
      === "https://a.io/p?q=v&ref=h")
    // ...but a caller-widened strip set takes it out
    assert(Seq("https://a.io/p?ref=h&q=v").toDF("u")
      .select(Urls.canonicalize($"u",
        "^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$").as("c"))
      .collect().head.getString(0) === "https://a.io/p?q=v")
    // all params tracking -> no '?'
    assert(canon("https://a.io/p?utm_campaign=z") === "https://a.io/p")
    // root url: trailing slash collapses
    assert(canon("https://a.io/") === "https://a.io")
    // case inside the PATH is preserved (paths are case-sensitive)
    assert(canon("https://a.io/CaseSensitive") === "https://a.io/CaseSensitive")
  }

  test("canonicalUrlDedup merges spellings and keeps the smallest id") {
    val df = Seq(
      (3L, "https://www.a.io/x?utm_source=1"),
      (1L, "HTTPS://A.IO/x/"),
      (2L, "https://a.io:443/x"),
      (9L, "https://b.io/y")).toDF("id", "url")
    val out = Dedup.canonicalUrlDedup(df, "url", "id")
      .orderBy("canonical_url").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("canonical_url") === "https://a.io/x")
    assert(out(0).getAs[Long]("keeper_id") === 1L)
    assert(out(0).getAs[Long]("docs") === 3L)
    assert(out(0).getAs[Long]("raw_spellings") === 3L)
    assert(out(1).getAs[Long]("docs") === 1L)
  }
}
