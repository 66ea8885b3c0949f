package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.x.WebText

/** Web-corpus hygiene operators: URL/domain parsing, HTML stripping,
  * accent folding. */
class WebTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("domainOf + registrableDomain extract hosts and collapse subdomains") {
    val df = Seq(
      "https://cdn.img.example.com/a/b?q=1",
      "http://example.com/",
      "https://localhost/x").toDF("url")
    val got = df.select(
      WebText.domainOf($"url").as("host"),
      WebText.registrableDomain(WebText.domainOf($"url")).as("dom"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("cdn.img.example.com", "example.com"),
      ("example.com", "example.com"),
      ("localhost", "localhost")))
  }

  test("stripHtml removes script/style subtrees, comments, tags, entities") {
    val html = "<html><head><STYLE>b {}</STYLE></head><body>" +
      "<!-- c1 --><h1 class=\"t\">Hi</h1><p>a &amp; b &lt;x&gt;&nbsp;&#39;q&#39;</p>" +
      "<script type=\"js\">if (1 < 2) { alert('&amp;'); }</script>done</body></html>"
    val got = Seq(html).toDF("h").select(WebText.stripHtml($"h")).as[String].head()
    assert(got == "Hi a & b <x> 'q' done")
  }

  test("canonicalizeUrl normalizes scheme/host/port/trackers/fragment, keeps path case") {
    val cases = Seq(
      // mixed case + default port + trackers everywhere + fragment
      "HTTPS://WWW.Example.COM:443/Page/One?utm_source=a&id=7&fbclid=x#frag" ->
        "https://www.example.com/Page/One?id=7",
      // trackers only → query disappears entirely
      "http://Example.com:80/p?utm_campaign=c&gclid=g" -> "http://example.com/p",
      // adjacent trackers collapse across passes
      "https://a.b/p?utm_a=1&utm_b=2&utm_c=3&keep=1" -> "https://a.b/p?keep=1",
      // empty path → "/", non-default port kept
      "https://Example.com:8443" -> "https://example.com:8443/",
      // path case preserved, unrelated params untouched
      "https://x.y/CaseSensitive/Path?b=2&a=1" -> "https://x.y/CaseSensitive/Path?b=2&a=1",
      // trackers match case-insensitively (?UTM_SOURCE= is the same tracker)
      "https://a.b/p?UTM_SOURCE=x&id=7&FBClid=y" -> "https://a.b/p?id=7",
      // non-URL input: only hygiene applied, no invention of scheme/host
      "not a url #fragment" -> "not a url ")
    val got = cases.map(_._1).toDF("u")
      .select(WebText.canonicalizeUrl($"u")).as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, wanted $want")
    }
    // the point of the op: every share-tagged variant of a page dedups to
    // one key
    val variants = Seq(
      "https://news.example.com/story/42?utm_source=tw",
      "HTTPS://NEWS.EXAMPLE.COM/story/42#top",
      "https://news.example.com:443/story/42?fbclid=abc")
    val keys = variants.toDF("u")
      .select(WebText.canonicalizeUrl($"u")).as[String].collect().toSet
    assert(keys == Set("https://news.example.com/story/42"))
  }

  test("foldAccents maps accented Latin letters to base letters") {
    val got = Seq("café über niño à l'école ça va ou ça voilà")
      .toDF("s").select(WebText.foldAccents($"s")).as[String].head()
    assert(got == "cafe uber nino a l'ecole ca va ou ca voila")
  }
}
