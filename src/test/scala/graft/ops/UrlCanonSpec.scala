package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Planted edges for [[TextAnalysis.canonicalizeUrl]] — each case
  * exercises one declared rule (case folding, default-port strip,
  * empty path, query sort, fragment strip) or the deterministic
  * degradation for non-URL input. */
class UrlCanonSpec extends SparkSuite {

  import spark.implicits._

  private val cases = Seq(
    ("HTTP://EX.COM:80/p?b=2&a=1#frag", "http://ex.com/p?a=1&b=2"),
    ("https://Ex.com:443", "https://ex.com/"),
    ("http://ex.com:8080/P", "http://ex.com:8080/P"), // port + path case kept
    ("HTTPS://S.COM:80/x", "https://s.com:80/x"), // :80 is NOT https default
    ("http://ex.com?", "http://ex.com/"), // lone '?' drops, path -> /
    ("http://ex.com/p?", "http://ex.com/p"),
    ("http://ex.com/p?c&b&a", "http://ex.com/p?a&b&c"),
    ("http://ex.com/p?a=1&&b", "http://ex.com/p?&a=1&b"), // empty param sorts first
    ("http://ex.com#only-frag", "http://ex.com/"),
    ("ftp://Ex.COM/f", "ftp://ex.com/f"), // other schemes: fold, no port rule
    ("http://[::1]:80/x", "http://[::1]/x"),
    ("not a url at all", "not a url at all"), // no prefix: path passthrough
    ("no-scheme.com/p?b&a", "no-scheme.com/p?a&b"),
    ("", "/")) // degenerate: empty path -> '/' (stable, documented)

  test("canonicalizeUrl applies the declared rule chain on planted edges") {
    val got = cases.map(_._1).zipWithIndex.map(_.swap).toDF("id", "url")
      .select(col("id"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) == want, s"<$in>: got <${got(i)}>, want <$want>")
    }
  }

  test("urlHost extracts the canonical host; non-URLs group under ''") {
    val hostCases = Seq(
      ("http://ex.com/p?a=1", "ex.com"),
      ("https://sub.do-main.org/", "sub.do-main.org"),
      ("http://ex.com:8080/x", "ex.com"), // port excluded from the key
      ("http://[::1]/x", "["), // bracket hosts stop at ':' — documented key shape
      ("ftp://f.io/a", "f.io"),
      ("not a url at all", ""),
      ("/just/a/path", ""))
    val got = hostCases.map(_._1).zipWithIndex.map(_.swap).toDF("id", "u")
      .select(col("id"), TextAnalysis.urlHost(col("u")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    hostCases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) == want, s"<$in>: got <${got(i)}>, want <$want>")
    }
  }
}
