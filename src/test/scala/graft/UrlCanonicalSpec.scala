package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{canonicalUrl, urlHost}

/** canonicalUrl edge cases the t44 gate's synthetic fixture can't cover
  * one by one: each row is (input, want) and the operator must map
  * every input to its canonical form exactly. */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalUrl normalizes every noise class and nothing else") {
    val cases = Seq(
      // scheme+host lowercase, path case preserved
      ("HTTPS://WWW.Ex.COM/Some/Path", "https://ex.com/Some/Path"),
      // default ports strip; mismatched/non-default ports stay
      ("http://a.com:80/x", "http://a.com/x"),
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:443/x", "http://a.com:443/x"),
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      // bare host with default port, no path
      ("http://a.com:80", "http://a.com"),
      // fragment drops
      ("http://a.com/x#frag", "http://a.com/x"),
      // utm params: only / first / last / several; other params survive
      ("http://a.com/x?utm_a=1", "http://a.com/x"),
      ("http://a.com/x?utm_a=1&q=2", "http://a.com/x?q=2"),
      ("http://a.com/x?q=2&utm_a=1", "http://a.com/x?q=2"),
      ("http://a.com/x?utm_a=1&utm_b=2", "http://a.com/x"),
      ("http://a.com/x?utm_a=1&q=2&utm_b=3", "http://a.com/x?q=2"),
      // CONSECUTIVE utm params all drop (the regex-deletion formulation
      // left every second one behind)
      ("http://a.com/x?utm_a=1&utm_b=2&q=3", "http://a.com/x?q=3"),
      // 'utm_' inside another param's NAME or VALUE is not a tracking
      // param — must survive byte-identical (the unanchored-regex bug)
      ("http://a.com/p?q=my_utm_test&r=1", "http://a.com/p?q=my_utm_test&r=1"),
      ("http://a.com/x?xutm_a=1&q=2", "http://a.com/x?xutm_a=1&q=2"),
      // trailing slashes strip, incl. after query removal
      ("http://a.com/x/", "http://a.com/x"),
      ("http://a.com/x/?utm_a=1", "http://a.com/x"),
      // ...but only PATH slashes: a slash ending the last query
      // parameter's VALUE is meaningful and survives (the strip runs
      // on the path before the kept query is re-attached)
      ("http://a.com/x?p=/dir/", "http://a.com/x?p=/dir/"),
      ("http://a.com/x/?p=/dir/", "http://a.com/x?p=/dir/"),
      // www strips only as a host prefix
      ("http://www.a.com/x", "http://a.com/x"),
      ("http://awww.a.com/x", "http://awww.a.com/x"),
      // non-URL strings pass through BYTE UNCHANGED — including ones
      // containing the chain's trigger characters (#, trailing /, utm_&)
      ("not a url at all", "not a url at all"),
      ("see note #3", "see note #3"),
      ("ends with slash/", "ends with slash/"),
      ("foo utm_x& bar", "foo utm_x& bar"),
      ("", ""))
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), canonicalUrl(col("u")).as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"canonicalUrl('$in') = '${got(in)}', " +
        s"want '$want'")
    // host extraction on canonical forms
    val hosts = Seq("https://ex.com/Some/Path", "http://a.com:8443/x",
      "plain").toDF("u").select(urlHost(col("u"))).collect().map(_.getString(0))
    assert(hosts.toSeq == Seq("ex.com", "a.com", ""))
  }
}
