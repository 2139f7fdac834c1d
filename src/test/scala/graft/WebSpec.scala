package graft

import graft.operators.Web
import org.scalatest.funsuite.AnyFunSuite

/** canonicalUrl edges the synthetic gate formula doesn't reach: the
  * operator must be a total function on messy real-world shapes, not
  * just the fixture's.
  */
class WebSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Web.canonicalUrl(org.apache.spark.sql.functions.col("url")))
      .as[String].collect().toSeq

  test("scheme/host lowering, www and default-port stripping") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path") == Seq("https://example.com/Path"))
    assert(canon("http://example.com:80/") == Seq("http://example.com/"))
    // non-default port survives
    assert(canon("http://example.com:8080/x") == Seq("http://example.com:8080/x"))
  }

  test("path case is preserved; only a trailing slash is stripped") {
    assert(canon("http://a.com/A/B/") == Seq("http://a.com/A/B"))
    assert(canon("http://a.com") == Seq("http://a.com/"))
  }

  test("tracking params drop, survivors sort, empty query vanishes") {
    assert(canon("http://a.com/p?utm_campaign=x&z=1&gclid=g&a=2#frag")
      == Seq("http://a.com/p?a=2&z=1"))
    assert(canon("http://a.com/p?utm_source=only") == Seq("http://a.com/p"))
    assert(canon("http://a.com/p?b=1&a=1&a=0") == Seq("http://a.com/p?a=0&a=1&b=1"))
  }

  test("domainOf takes the registrable tail and ignores subdomains/ports") {
    val d = Seq("https://news.example.com/x", "http://example.com:8080/y",
      "https://a.b.c.site.org/z").toDF("url")
      .select(Web.domainOf(Web.canonicalUrl(org.apache.spark.sql.functions.col("url"))))
      .as[String].collect().toSeq
    assert(d == Seq("example.com", "example.com", "site.org"))
  }
}
