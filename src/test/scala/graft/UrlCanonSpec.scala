package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlCanon

/** URL canonicalization rules (q167), pinned case by case. */
class UrlCanonSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(url: String): (Option[String], Option[String]) = {
    val r = UrlCanon.withCanonical(
      Seq(Tuple1(url)).toDF("url"), "url").collect().head
    (Option(r.getAs[String]("canon_url")),
      Option(r.getAs[String]("url_host")))
  }

  test("each normalization rule, pinned") {
    // case + default port + duplicate/trailing slashes + fragment
    assert(canon("HTTP://WWW.Example.COM:80//a//b/?q=1#frag") ==
      ((Some("http://www.example.com/a/b?q=1"),
        Some("www.example.com"))))
    // userinfo dropped; https default port stripped
    assert(canon("https://u:p@Host.COM:443/x/") ==
      ((Some("https://host.com/x"), Some("host.com"))))
    // non-default port kept; empty path becomes root
    assert(canon("https://host.com:8080") ==
      ((Some("https://host.com:8080/"), Some("host.com"))))
    // :443 is NOT http's default — kept
    assert(canon("http://host.com:443/x") ==
      ((Some("http://host.com:443/x"), Some("host.com"))))
    // root path survives as '/'
    assert(canon("http://host.com/") ==
      ((Some("http://host.com/"), Some("host.com"))))
    // query kept verbatim (no param reordering)
    assert(canon("http://h.com/p?b=2&a=1") ==
      ((Some("http://h.com/p?b=2&a=1"), Some("h.com"))))
    // non-URLs and scheme-less strings canonicalize to null
    assert(canon("not a url") == ((None, None)))
    assert(canon("www.example.com/a") == ((None, None)))
    // canonical output is a fixpoint
    val c = canon("HTTP://WWW.Example.COM:80//a//b/?q=1#frag")._1.get
    assert(canon(c)._1.contains(c))
  }
}
