package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-curation step BEFORE content
  * dedup: the same resource arrives as `HTTP://WWW.Example.COM:80//a/`
  * and `http://www.example.com/a`, and URL-level dedup (the cheapest
  * dedup a crawl runs, RFC 3986 §6 syntax-based normalization) only
  * works on a canonical form. Rules applied, in order:
  *
  *  1. scheme and authority lowercase;
  *  2. userinfo dropped (`user:pass@host` → `host`);
  *  3. default ports stripped (`:80` for http, `:443` for https —
  *     non-default ports kept);
  *  4. path: runs of `/` collapsed, trailing `/` stripped (except the
  *     root path), empty path → `/`;
  *  5. fragment dropped (never sent to the server);
  *  6. query kept verbatim (param reordering changes semantics for
  *     some endpoints — out of scope by design).
  *
  * Strings that do not parse as absolute URLs canonicalize to null
  * (crawl frontiers filter on it). Everything is composition of
  * codegen'd builtins (regexp_extract / regexp_replace / lower) with
  * patterns portable to RE2, so the DuckDB oracle (q167) replays the
  * identical normalization. Narrow in-row work — no shuffle.
  */
object UrlCanon {

  private val Re =
    "^([A-Za-z][A-Za-z0-9+.\\-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** (canonical url column, host column) for a raw url column. */
  def canonical(u: Column): (Column, Column) = {
    val scheme = lower(regexp_extract(u, Re, 1))
    val auth = regexp_replace(
      lower(regexp_extract(u, Re, 2)), "^[^@]*@", "")
    val authPort = when(scheme === "http",
        regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val host = regexp_replace(authPort, ":[0-9]+$", "")
    val path0 = regexp_replace(regexp_extract(u, Re, 3), "/{2,}", "/")
    val path = when(path0 === "", lit("/"))
      .when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(u, Re, 4)
    val canon = when(scheme === "" || host === "", lit(null))
      .otherwise(concat(scheme, lit("://"), authPort, path, query))
    (canon, when(canon.isNull, lit(null)).otherwise(host))
  }

  /** Add `canon_url` and `url_host` to `df`. */
  def withCanonical(df: DataFrame, urlCol: String): DataFrame = {
    val (c, h) = canonical(col(urlCol))
    df.withColumn("canon_url", c).withColumn("url_host", h)
  }

  /** Deterministic mixed-shape URL fixture: scheme/host casing, the
    * two default ports plus a non-default one, duplicate-slash and
    * trailing-slash paths, userinfo, queries, fragments, and
    * non-URL garbage — each a closed form in the row index so the
    * DuckDB oracle rebuilds the exact raw strings. */
  def syntheticUrls(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val url =
        if (i % 11 == 10) s"not a url $i"
        else {
          val scheme = if (i % 2 == 0) "HTTP" else "https"
          val user = if (i % 7 == 3) "u:p@" else ""
          val host = s"WWW.Example${i % 7}.COM"
          val port = Seq("", ":80", ":443", ":8080")(i % 4)
          val path = Seq("", "/", "//a//b/", "/a/b")((i / 4) % 4)
          val query = if (i % 3 == 0) s"?q=$i&x=1" else ""
          val frag = if (i % 5 == 0) "#sec" else ""
          s"$scheme://$user$host$port$path$query$frag"
        }
      (i.toLong, url)
    }
    rows.toDF("url_id", "url")
  }
}
