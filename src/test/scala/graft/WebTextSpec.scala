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

  test("foldAccents maps accented Latin letters to base letters") {
    val got = Seq("café über niño à l'école ça va ou ça voilà")
      .toDF("s").select(WebText.foldAccents($"s")).as[String].head()
    assert(got == "cafe uber nino a l'ecole ca va ou ca voila")
  }
}
