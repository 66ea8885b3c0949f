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

  // tracking parameters stripped by canonicalizeUrl — public so the
  // oracle-SQL builder interpolates the identical alternation. The (?i:)
  // group makes the match case-insensitive (?UTM_SOURCE=, &FBCLID= are the
  // same trackers — query keys are case-insensitively equivalent for these
  // in practice, and a case-sensitive strip would leave "the same page"
  // under multiple dedup keys); inline-group syntax is shared by Java
  // regex and RE2, so Spark and the DuckDB oracle agree.
  val TrackingParams = "(?i:utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref)"

  /** Canonicalize a URL for crawl dedup — the normalization that makes
    * "the same page" hash to the same key: strip the fragment, drop
    * tracking parameters (utm_*, fbclid, gclid, msclkid, ref), lowercase
    * scheme and host (NOT the path — paths are case-sensitive), drop the
    * scheme's default port, and normalize an empty path to "/". Crawlers
    * key frontier dedup and URL-level corpus dedup on exactly this form;
    * without it every utm-tagged share of a page is a "new" document.
    *
    * Pure regexp/extract composition — codegen'd, no UDF, and every step
    * replays in the oracle (RE2-safe: no lookaround, no backreferences in
    * patterns; the one replacement backref `$1` is RE2-supported). The
    * tracking-param pass runs three times because each pass consumes the
    * separator of the NEXT parameter when trackers are adjacent — three
    * passes converge for any realistic run of them. Non-URL input (no
    * scheme://host) is returned with only fragment/tracker hygiene
    * applied. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = (1 to 3).foldLeft(noFrag) { (u, _) =>
      regexp_replace(u, s"([?&])($TrackingParams)=[^&]*&", "$1")
    }
    val noTail = regexp_replace(noTrack, s"[?&]($TrackingParams)=[^&]*$$", "")
    val clean = regexp_replace(noTail, "\\?$", "")
    val scheme = lower(regexp_extract(clean, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(clean, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = regexp_replace(clean, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    when(scheme === "" || hostPort === "", clean)
      .otherwise(concat(scheme, lit("://"), host,
        when(rest === "", lit("/")).otherwise(rest)))
  }

  // public: the oracle-SQL builder interpolates the same map
  val AccentFrom = "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
  val AccentTo = "aaaaaaceeeeiiiinooooouuuuyy"

  /** Fold Latin accents to their base letters (lowercase input expected —
    * compose with `lower`). translate() is a per-codepoint map: one pass,
    * no regex engine. */
  def foldAccents(text: Column): Column = translate(text, AccentFrom, AccentTo)
}
