package graft.x

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text hygiene: URL/domain handling, HTML boilerplate
  * stripping, and accent folding — the row-local cleanup passes a crawl →
  * training-data pipeline runs before dedup/quality scoring. Everything is
  * built-in-expression composition (regexp_replace / translate /
  * parse_url), so it is embarrassingly parallel, stays inside whole-stage
  * codegen, and every transform is replayed exactly by the DuckDB oracle
  * (RE2-compatible patterns only: no backreferences, explicit per-tag
  * script/style patterns instead of `</\1>`).
  */
object WebText {

  /** Host component of a URL (`https://a.b.c/p?q` → `a.b.c`) via the
    * builtin parse_url expression. */
  def domainOf(url: Column): Column = call_function("parse_url", url, lit("HOST"))

  /** Registrable-domain approximation: last two dot-labels of the host
    * (`cdn.img.example.com` → `example.com`). Public-suffix-list precision
    * is a lookup-table refinement, not a different plan shape. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 2, host)
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
  }

  /** Strip HTML to visible text: drop script/style subtrees, comments and
    * tags, unescape the common entities, collapse whitespace. Single
    * projection of chained regexp_replace/replace — no UDF, no parser
    * (crawl-scale boilerplate removal; a DOM-accurate extractor would sit
    * behind the same signature). */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  // public: the oracle-SQL builder interpolates the same map
  val AccentFrom = "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
  val AccentTo = "aaaaaaceeeeiiiinooooouuuuyy"

  /** Fold Latin accents to their base letters (lowercase input expected —
    * compose with `lower`). translate() is a per-codepoint map: one pass,
    * no regex engine. */
  def foldAccents(text: Column): Column = translate(text, AccentFrom, AccentTo)
}
