package graft.x

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY.md §2.9 X4):
  * token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting. Everything is built-in-expression only — embarrassingly
  * parallel, zero shuffles, full whole-stage codegen; the only shuffle in
  * this file is the optional corpus-level stats aggregation.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token estimate: words + punctuation runs counted
    * separately (a cheap stand-in for a real tokenizer's token count, the
    * standard pre-training size heuristic). */
  def subwordTokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def charCount(text: Column): Column = length(text)

  def avgWordLength(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    (length(regexp_replace(text, "\\s+", "")).cast("double") / size(toks))
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "be")

  /** Fraction of tokens that are (English) stopwords — a classic
    * quality/fluency signal in pre-training filters. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(array_intersect(toks, typedlit(stopwords))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length band + word-shape + low
    * punctuation noise (Gopher/C4-style heuristic filters, re-weighted). */
  def qualityScore(text: Column): Column = {
    val lenScore = when(charCount(text).between(50, 20000), 1.0)
      .when(charCount(text).between(20, 50), 0.5).otherwise(0.0)
    val wordScore = when(avgWordLength(text).between(2.0, 12.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.2)
    round((lenScore * 0.4 + wordScore * 0.4 + punctScore * 0.2), 4)
  }

  /** Language-ID heuristic: CJK/Cyrillic/Arabic char-range detection first,
    * then Latin-script stopword voting (n-gram-free approximation of the
    * classic fastText-style classifier; good enough to route documents). */
  def languageIdHeuristic(text: Column): Column = {
    def ratio(pattern: String): Column =
      length(regexp_replace(text, pattern, "")).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    // ratio() measures chars REMAINING after stripping the class, so a low
    // remainder means the class dominates.
    val cjk = ratio("[\\u4E00-\\u9FFF\\u3040-\\u30FF]") // strip CJK
    val cyr = ratio("[\\u0400-\\u04FF]")
    val arab = ratio("[\\u0600-\\u06FF]")
    val toks = split(lower(trim(text)), "\\s+")
    def vote(words: Seq[String]): Column =
      size(array_intersect(toks, typedlit(words))).cast("double")
    val en = vote(Seq("the", "and", "of", "to", "is", "in", "that", "it"))
    val es = vote(Seq("el", "la", "de", "que", "y", "los", "las", "una"))
    val de = vote(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))
    val fr = vote(Seq("le", "la", "les", "des", "est", "une", "dans", "pour"))
    when(cjk < 0.7, lit("zh"))
      .when(cyr < 0.7, lit("ru"))
      .when(arab < 0.7, lit("ar"))
      .when(es > en && es >= de && es >= fr, lit("es"))
      .when(de > en && de >= fr, lit("de"))
      .when(fr > en, lit("fr"))
      .otherwise(lit("en"))
  }

  /** 55-bit document fingerprint over normalized content (case/whitespace
    * folded) — the cheap exact-dup key. [[graft.functions.PolyHash56]] so
    * the oracle replays the identical fold (xxhash64 has no SQL mirror). */
  def fingerprint(text: Column): Column =
    graft.functions.PolyHash56(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Robust winnowing (Schleimer/Wilkerson/Aiken, the MOSS algorithm):
    * from every window of `w` consecutive n-gram hashes select the
    * minimum, ties broken by the RIGHTMOST occurrence; the distinct
    * selected `(pos, fingerprint)` set is the document's sketch. The
    * guarantee: any token run of length ≥ n+w−1 shared by two documents
    * contributes at least one IDENTICAL selected fingerprint to both —
    * so a fingerprint-store join finds every long overlap while storing
    * only ~2/(w+1) of the gram hashes. THAT density reduction is the
    * 100 TB story: the posting store shrinks ~(w+1)/2× versus indexing
    * every shingle ([[graft.x.Dedup.repeatedPassages]] keeps all windows;
    * winnowing is the bounded-storage sibling for corpus-wide indexes).
    *
    * Mechanics: min-hash-with-rightmost-tiebreak is ONE numeric `min`
    * over the key `h·2³¹ + (2³¹−1−pos)` carried as DECIMAL(38,0) — the
    * high bits compare the hash, the complemented low bits break ties
    * toward the larger position; the whole comparison stays inside a
    * codegen'd window min (no struct ordering, no UDF), and DuckDB
    * replays it verbatim in HUGEINT. Only full windows select (start ≤
    * N−w); a doc with fewer than `w` grams degenerates to the global
    * minimum (window = everything), matching [[minShingleFingerprint]].
    *
    * Shape: narrow gram expansion, ONE doc-keyed exchange for the window
    * sort, O(w) state per row — linear in corpus size at any scale. */
  def winnow(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(w >= 1, s"w must be >= 1, got $w")
    val B = 2147483648L // 2^31: more gram positions than any document has
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = df
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__ng", size(col("__toks")) - (n - 1))
      .filter(col("__ng") >= 1)
      .select(col(idCol), col("__ng"),
        posexplode(transform(sequence(lit(0), col("__ng") - 1),
          i => graft.functions.PolyHash56(concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
          .as(Seq("s", "__h")))
    val key = col("__h").cast("decimal(38,0)") * lit(B) + (lit(B - 1) - col("s"))
    val v = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("__mkey", min(key).over(v))
      .filter(col("s") <= col("__ng") - w || col("s") === 0)
      .select(col(idCol),
        (lit(B - 1) - (col("__mkey") % lit(B))).cast("long").as("pos"),
        ((col("__mkey") - (col("__mkey") % lit(B))) / lit(B)).cast("long").as("fp"))
      .distinct()
  }

  /** Rolling-hash winnowing fingerprint: minimum shingle hash per window —
    * here the global minimum n-gram hash (w = ∞), the degenerate winnow
    * that still identifies containment-heavy near-dups cheaply. */
  def minShingleFingerprint(text: Column, n: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => graft.functions.PolyHash56(concat_ws(" ", slice(toks, i + 1, lit(n))))
    )
    array_min(grams)
  }

  /** PII redaction for training corpora: replace emails / URLs / long digit
    * runs (phone-ish) with typed placeholder tokens and count what was hit.
    * Regexes are deliberately engine-portable (no lookaround), so the same
    * patterns run under Java regex and RE2-family engines. Narrow
    * projection — no shuffle, embarrassingly parallel. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^\\s]+"
  private val phoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        urlRe, "<URL>"),
      phoneRe, "<PHONE>")

  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(emailRe), lit(0))),
    size(regexp_extract_all(text, lit(urlRe), lit(0))),
    size(regexp_extract_all(regexp_replace(regexp_replace(text, emailRe, " "), urlRe, " "),
      lit(phoneRe), lit(0))) // count phones on the email/url-stripped text, like redaction order does
  )

  /** Token-level PII extents: (idCol, start_tok, end_tok, kind) for every
    * token containing an email / URL / phone-shaped substring — the same
    * `[start_tok, end_tok)` coordinates the decontamination extents use,
    * so [[maskSpans]] applies them unchanged (PII surgery instead of
    * whole-doc redaction: [[redactPii]] rewrites the string in place;
    * this pinpoints WHERE, feeds the audit trail, and composes with any
    * other extent source). The phone pattern is the token-granular form
    * of the redaction one (no spaces — a token can't contain them).
    * Narrow generator + filter: no shuffle, map-side at any scale. */
  def piiExtents(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokenPhoneRe = "\\+?[0-9][0-9()\\-.]{6,}[0-9]"
    df.select(col(idCol),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("__p", "__tok")))
      .withColumn("kind",
        when(col("__tok").rlike(emailRe), "email")
          .when(col("__tok").rlike(urlRe), "url")
          .when(col("__tok").rlike(tokenPhoneRe), "phone"))
      .filter(col("kind").isNotNull)
      .select(col(idCol), col("__p").as("start_tok"),
        (col("__p") + 1).as("end_tok"), col("kind"))
  }

  /** Document chunking for training pipelines: split each doc into
    * overlapping token windows (`chunkTokens` per chunk, stepping by
    * `chunkTokens - overlap`). Pure generator expansion — no shuffle, no
    * driver round-trip; at 100 TB this is a map-side fan-out whose output
    * partitioning follows the input. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, s"overlap $overlap must be in [0, $chunkTokens)")
    val step = chunkTokens - overlap
    val toks = col("__toks")
    df.filter(length(trim(col(textCol))) > 0) // empty/null docs have no chunks
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(step)),
          s => concat_ws(" ", slice(toks, s + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("chunk_tokens", tokenCount(col("chunk_text")))
  }

  /** Corpus n-gram frequency table: lowercase whitespace tokens, sliding
    * n-token windows, global counts with an optional floor — the LM-data
    * staple behind contamination scans, n-gram LM training, and
    * memorization analysis. Map-side generator expansion plus ONE count
    * shuffle keyed by the gram (partial aggregation collapses
    * per-partition counts before the exchange); `minCount` prunes the
    * long tail at the final aggregate, so the dominant cost at 100 TB is
    * the scan and one gram-keyed exchange of partial counts. */
  def ngramCounts(df: DataFrame, textCol: String, n: Int,
      minCount: Long = 1L): DataFrame = {
    require(n >= 1, "n-grams need n >= 1")
    val toks = col("__toks")
    df.filter(length(trim(col(textCol))) > 0)
      .select(split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .filter(size(toks) >= n)
      .select(explode(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        s => concat_ws(" ", slice(toks, s, lit(n))))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("gram"), col("cnt").cast("long").as("cnt"))
  }

  /** Grouped heavy hitters: the k most frequent tokens per group (e.g.
    * per language) — corpus characterization, stopword discovery, and
    * drift monitoring in one query. Counts aggregate with map-side
    * partials in ONE (group, term)-keyed shuffle; the rank ≤ k filter
    * compiles to WindowGroupLimit, so the second (group-keyed) exchange
    * carries at most k terms per upstream partition, never the full
    * vocabulary. Ties break by term so the result is total-order
    * deterministic. */
  def topTermsPerGroup(df: DataFrame, textCol: String, groupCol: String,
      k: Int): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("term").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("int").as("rank"),
        col("term"), col("cnt").cast("long").as("cnt"))
  }

  /** Sequence packing: assign token-counted chunks to fixed-budget packs
    * (`maxTokens` each) by contiguous fill — pack_id = exclusive-cumulative
    * token count ÷ budget within a shard. The standard pre-training batch
    * prep step (packing short sequences so attention windows aren't wasted
    * on padding).
    *
    * Scale: the cumulative sum runs per `shardCol` partition, so packing
    * 100 TB is embarrassingly parallel across shards (one window shuffle,
    * no global sort); packs never cross shards, which is exactly how a
    * multi-node pipeline wants it. A pack may exceed `maxTokens` by at most
    * one chunk's tokens (budgeted contiguous fill, not exact bin packing —
    * exact packing is NP-hard and order-destroying). */
  def packSequences(chunks: DataFrame, shardCol: String, orderCols: Seq[String],
      tokenCol: String, maxTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__cum", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("pack_id", (col("__cum") / maxTokens).cast("long"))
      .withColumn("pack_offset", col("__cum") % maxTokens)
      .drop("__cum")
  }

  /** TF-IDF over whitespace-lowered tokens: tf per (doc, term), document
    * frequency per term, `tfidf = tf * (ln((N+1)/(df+1)) + 1)` (smoothed,
    * sklearn-style). Two shuffles (doc-term tf, term df); the df side is
    * broadcast back, so the corpus never reshuffles twice. */
  def tfidf(df: DataFrame, textCol: String, idCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val terms = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    // materialized once: both the df aggregation and the final join read it
    // (without truncation the explode+tf shuffle runs twice — at 100 TB
    // inject a durable Staging: tf is the single most reused scoring
    // artifact, and executor loss mid-scoring would otherwise recompute it)
    val tf = staging.stage(
      terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")), "tf")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val n = df.select(countDistinct(col(idCol)).as("__n"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + 1).cast("double") / (col("dfreq") + 1)) + 1.0))
      .select(col(idCol), col("term"), col("tf"), col("dfreq"), col("tfidf"))
  }

  /** Okapi BM25 relevance weights per (doc, term) — the retrieval-grade
    * companion to [[tfidf]] (length-normalized, saturating tf). Same
    * shuffle shape: tf by (doc, term), then document frequency and the
    * tiny per-doc length / corpus stats ride broadcasts back. Formula
    * terms are written in one fixed association order so the oracle's
    * IEEE arithmetic reproduces every weight. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val terms = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    // staged: tf feeds the document-frequency aggregate, the length
    // aggregate, AND the final weight join — without truncation each
    // consumer re-runs the tokenize-explode shuffle (at 100 TB that is
    // the dominant pass, three times over). dl derives from tf (the sum
    // of per-term counts IS the token count), so the explode runs once.
    val tf = staging.stage(
      terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")),
      "bm25-tf")
    val lens = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val stats = lens.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("nd"))
    val idf = log((col("nd") - col("dfreq") + 0.5) / (col("dfreq") + 0.5) + 1.0)
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(lens), idCol)
      .crossJoin(broadcast(stats))
      .withColumn("bm25",
        idf * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
      .select(col(idCol), col("term"), col("tf"), col("dfreq"), col("dl"), col("bm25"))
  }

  /** Training-budget accounting: per-group document/token totals with
    * exact token shares and the cumulative share in descending-token
    * order — the report a mixture designer reads before setting sampling
    * weights ("the top 3 sources are 80% of the tokens"), and the input
    * [[graft.x.Sampling.mixtureRebalance]] / `temperatureRebalance`
    * targets are derived from.
    *
    * Shape at 100 TB: ONE corpus aggregation with map-side partials (the
    * token count is a codegen'd expression, not a tokenize-explode);
    * everything after runs on the #groups-row result — groups are
    * sources/languages/domains by contract (thousands, not millions), so
    * the single-partition ranking window is driver-sized work. Shares
    * divide exact BIGINT totals in one fixed association order, so every
    * column replays engine-exact. */
  /** Jensen–Shannon divergence between two corpora's unigram
    * distributions (Lin 1991) — the symmetric, always-finite
    * distribution-drift statistic for TOKEN space, where
    * [[graft.x.Profiler.psiDrift]] covers numeric columns: "how far has
    * the training mix moved", "are these two sources interchangeable".
    * JS = (KL(P‖M) + KL(Q‖M)) / 2 with M the midpoint mixture; bounded
    * by ln 2 nats (1 bit), 0 iff identical distributions — terms absent
    * from one side contribute finitely, unlike raw KL.
    *
    * One row out: token/term totals per side, the shared-term count,
    * and the divergence in nats and bits. Determinism: every per-term
    * `p·ln(p/m)` double (exact-count ratios, fixed association shape)
    * quantizes to DECIMAL(18,8) before the order-free sum — the
    * [[unigramLogProb]] ln-replay recipe; the bits conversion divides by
    * the ln 2 LITERAL so both engines share one constant.
    *
    * Shape at 100 TB: one tokenize+count aggregation per side (staged —
    * the totals and the joined term frame both read it), one term-keyed
    * full-outer join of the two VOCABULARY-scale frames (corpus rows
    * never meet the join), one scalar aggregate. */
  def tokenJsDivergence(a: DataFrame, b: DataFrame, textCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    def freqs(df: DataFrame, side: String) = staging.stage(
      df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as(s"__c$side")), s"js-freq-$side")
    val fa = freqs(a, "a")
    val fb = freqs(b, "b")
    val na = fa.agg(sum("__ca").as("__na"))
    val nb = fb.agg(sum("__cb").as("__nb"))
    val joined = fa.join(fb, Seq("term"), "full_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(coalesce(col("__ca"), lit(0L)).as("ca"),
        coalesce(col("__cb"), lit(0L)).as("cb"),
        col("__na"), col("__nb"))
    val p = col("ca").cast("double") / col("__na").cast("double")
    val q = col("cb").cast("double") / col("__nb").cast("double")
    val m = (p + q) / lit(2.0)
    joined
      .select(
        when(col("ca") > 0, p * log(p / m)).otherwise(lit(0.0))
          .cast("decimal(18,8)").as("__tp"),
        when(col("cb") > 0, q * log(q / m)).otherwise(lit(0.0))
          .cast("decimal(18,8)").as("__tq"),
        when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L).as("__sh"),
        when(col("ca") > 0, 1L).otherwise(0L).as("__ta"),
        when(col("cb") > 0, 1L).otherwise(0L).as("__tb"),
        col("__na"), col("__nb"))
      .agg(max("__na").as("__na"), max("__nb").as("__nb"),
        sum("__ta").as("__terms_a"), sum("__tb").as("__terms_b"),
        sum("__sh").as("__shared"),
        sum("__tp").as("__kp"), sum("__tq").as("__kq"))
      .select(col("__na").cast("long").as("tokens_a"),
        col("__nb").cast("long").as("tokens_b"),
        col("__terms_a").cast("long").as("terms_a"),
        col("__terms_b").cast("long").as("terms_b"),
        col("__shared").cast("long").as("shared_terms"),
        round((col("__kp") + col("__kq")).cast("double") / lit(2.0), 6)
          .as("js_nats"),
        round((col("__kp") + col("__kq")).cast("double") / lit(2.0) /
          lit(0.6931471805599453), 6).as("js_bits"))
  }

  /** Zipf rank-frequency fit over the unigram table: OLS of ln(count) on
    * ln(rank) — the corpus-law companion to [[heapsLaw]]-style vocabulary
    * growth (x205): natural text sits near slope −1; heavy boilerplate
    * duplication flattens the head (slope → 0 over the top ranks),
    * templated/synthetic text shows a truncated tail. One number a
    * corpus-quality gate can threshold, plus r² for "is it even a power
    * law".
    *
    * Ranks are the (count DESC, term ASC) total order computed by
    * [[graft.x.Dedup.globalRowNumber]] — never a single-partition
    * window. Determinism: each ln() double quantizes to DECIMAL(18,8)
    * per row; the five OLS moments are exact decimal sums (products stay
    * decimal), and slope/intercept/r² are one fixed-shape IEEE chain on
    * those exact moments — the [[unigramLogProb]] ln-replay recipe
    * applied to regression.
    *
    * Shape at 100 TB: one tokenize+count aggregation (the only
    * corpus-scale pass), a distributed range rank over the
    * VOCABULARY-scale frequency table, one moment aggregate. */
  def zipfFit(df: DataFrame, textCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val freq = staging.stage(
      df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("__c")), "zipf-freq")
    val ranked = graft.x.Dedup.globalRowNumber(freq,
      Seq(col("__c").desc, col("term").asc), staging)
    val pts = ranked.select(
      log(col("rank").cast("double")).cast("decimal(18,8)").as("__x"),
      log(col("__c").cast("double")).cast("decimal(18,8)").as("__y"))
    val m = pts.agg(count(lit(1)).as("__n"),
      sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("__n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double"); val sxx = col("__sxx").cast("double")
    val syy = col("__syy").cast("double")
    val den = nD * sxx - sx * sx
    val slope = (nD * sxy - sx * sy) / den
    val r2num = (nD * sxy - sx * sy) * (nD * sxy - sx * sy)
    val r2den = den * (nD * syy - sy * sy)
    m.select(col("__n").cast("long").as("n_terms"),
      round(when(den === 0.0, lit(null).cast("double")).otherwise(slope), 6)
        .as("slope"),
      round(when(den === 0.0, lit(null).cast("double"))
        .otherwise((sy - slope * sx) / nD), 6).as("intercept"),
      round(when(r2den === 0.0, lit(null).cast("double"))
        .otherwise(r2num / r2den), 6).as("r2"))
  }

  def tokenBudget(df: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "token budget needs at least one group column")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("tokens"))
    val ord = col("tokens").desc +: groupCols.map(col(_).asc)
    val cum = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__total", sum("tokens").over(Window.partitionBy()))
      .withColumn("share", col("tokens").cast("double") / col("__total").cast("double"))
      .withColumn("cum_share",
        sum("tokens").over(cum).cast("double") / col("__total").cast("double"))
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select(groupCols.map(col) ++ Seq(col("docs"), col("tokens"),
        col("share"), col("cum_share"), col("rank")): _*)
  }

  /** Hashed-linear document scorer — the fastText/CCNet-style quality
    * classifier shape: each token hashes into one of `nBuckets` feature
    * buckets, the model is a `(bucket, weight)` table, and a document's
    * score is the mean bucket weight over its tokens. This is how
    * production corpus filters actually run (a linear model over hashed
    * bag-of-words features, trained offline, applied at full corpus
    * scale); the training step is out of scope — `weights` is any table
    * with `bucket: BIGINT` and `weight: BIGINT` columns.
    *
    * Weights are FIXED-POINT integers (`weight` = real weight × `scale`),
    * so the per-document accumulation is exact integer arithmetic —
    * partial-aggregation order can't perturb it, and the score replays
    * bit-for-bit on any engine: the only IEEE operations are the final
    * `(margin / scale) / n_tokens`, in that fixed association order.
    *
    * Shape at 100 TB: the model rides a BROADCAST (nBuckets rows — 2²⁰
    * buckets is ~16 MB); tokens bucket via the codegen'd
    * [[graft.functions.PolyHash56]] and join the model MAP-SIDE, then ONE
    * document-keyed shuffle with map-side partial sums carries 16 bytes
    * per doc. Documents with zero tokens produce no row (nothing to
    * average). */
  def hashedLinearScore(df: DataFrame, weights: DataFrame,
      textCol: String, idCol: String, nBuckets: Int,
      scale: Long = 1000L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    toks
      .withColumn("bucket", pmod(graft.functions.PolyHash56(col("tok")), lit(nBuckets.toLong)))
      .join(broadcast(weights.select(col("bucket"), col("weight"))), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight"), lit(0L))).as("__margin"))
      .withColumn("score",
        (col("__margin").cast("double") / lit(scale.toDouble)) / col("n_tokens").cast("double"))
      .select(col(idCol), col("n_tokens"), col("score"),
        (col("score") > 0).cast("int").as("label"))
  }

  /** Full-text retrieval: top-`k` documents per query, ranked by summed
    * Okapi BM25 over the query's terms — the classic sparse-retrieval
    * ranker ([[bm25]] scores a (doc, term) matrix; this composes it into
    * the search operation a retrieval pipeline actually runs, e.g. when
    * mining pre-training corpora for RAG evaluation sets).
    *
    * `queries` and `docs` MUST use distinct id column names (the output
    * carries both). Query terms are de-duplicated per query (standard
    * bag-of-words query semantics; repeating a term in a query does not
    * double its weight here).
    *
    * Determinism contract (shared with [[unigramLogProb]]): each (doc,
    * term) weight's raw IEEE double is cast ONCE to DECIMAL(18,8); the
    * per-(query, doc) sum is exact decimal arithmetic, so ranking and
    * scores replay identically on any engine and partitioning. Ties break
    * on doc id.
    *
    * Shape at 100 TB: the corpus-side weight matrix comes from [[bm25]]
    * (one (doc, term) shuffle; df/length stats ride broadcasts). The
    * query set is small by nature — its exploded terms BROADCAST, so the
    * weight matrix joins map-side and only MATCHED (query, doc) partials
    * shuffle once for the score sum. The `rank <= k` filter compiles to
    * WindowGroupLimit: each map task keeps a k-row heap per query before
    * the final exchange, so the ranking moves ≤ k rows per (partition,
    * query) — never the full match list. */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
      textCol: String, idCol: String,
      qTextCol: String, qIdCol: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(qIdCol != idCol, s"query id column must differ from doc id column ($idCol)")
    val weights = bm25(docs, textCol, idCol, k1, b, staging)
      .withColumn("__w", col("bm25").cast("decimal(18,8)"))
    val qTerms = queries.select(col(qIdCol),
      explode(array_distinct(filter(
        split(lower(trim(col(qTextCol))), "\\s+"), t => length(t) > 0))).as("term"))
    val scored = weights.join(broadcast(qTerms), "term")
      .groupBy(col(qIdCol), col(idCol))
      .agg(count(lit(1)).as("matched_terms"), sum("__w").as("__score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("__score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("matched_terms"),
        col("__score").cast("double").as("score"), col("rank"))
  }

  /** Benchmark decontamination: drop training documents whose normalized
    * content fingerprint collides with any document in `benchmark` — the
    * standard eval-leakage guard before pre-training. The benchmark side is
    * tiny by nature, so its fingerprint set rides a broadcast and the
    * training corpus is a single anti-join pass (no shuffle of the corpus;
    * n-gram-overlap decontamination composes [[minShingleFingerprint]] or
    * [[graft.x.Dedup.shingles]] the same way). */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val bfp = benchmark.select(fingerprint(col(textCol)).as("__fp")).distinct()
    train.withColumn("__fp", fingerprint(col(textCol)))
      .join(broadcast(bfp), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Fuzzy (near-duplicate) decontamination: drop training documents
    * whose n-gram-set Jaccard similarity with ANY benchmark document
    * reaches `threshold` — the n-gram-overlap eval-leakage guard
    * large-LM training runs apply, one tier stronger than
    * [[decontaminate]] (exact normalized fingerprints miss a lightly
    * edited benchmark copy) and stronger than [[passageDecontaminate]]
    * for whole-document paraphrase-ish leaks (it needs a verbatim
    * window; this needs only set overlap). A benchmark member itself
    * (Jaccard 1) always drops, so this SUBSUMES exact decontamination
    * wherever docs are ≥ n tokens.
    *
    * EXACT, not LSH-approximate: the benchmark side is tiny by nature,
    * so its shingle set rides a broadcast and every (train, benchmark)
    * intersection is computed map-side — the corpus is never
    * self-joined and never shuffled by shingle; only the (train doc,
    * bench doc) HITS shuffle once for the intersection counts, the same
    * shape as [[contaminationReport]]. Shingles travel as fused 8-byte
    * [[graft.functions.NGramPolyHash]] values (never gram strings). A
    * benchmark too big to broadcast composes with the LSH band store
    * exactly like [[graft.x.Dedup.incrementalNearDup]] — at that point
    * the candidates are approximate and verification stays exact. */
  def jaccardDecontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val tSh = Dedup.shingleHashes(train, textCol, idCol, n)
    val bSh = Dedup.shingleHashes(benchmark, textCol, idCol, n).toDF("__bid", "__sh")
    val tSizes = tSh.groupBy(col(idCol)).agg(count(lit(1)).as("__tn"))
    val bSizes = bSh.groupBy("__bid").agg(count(lit(1)).as("__bn"))
    val inter = tSh.join(broadcast(bSh), "__sh")
      .groupBy(col(idCol), col("__bid")).agg(count(lit(1)).as("__i"))
    val flagged = inter
      .join(tSizes, idCol)
      .join(broadcast(bSizes), "__bid")
      .filter(col("__i").cast("double") /
        (col("__tn") + col("__bn") - col("__i")).cast("double") >= threshold)
      .select(col(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Substring-level (passage) decontamination: the extents of every
    * training-doc token span ≥ `windowTokens` long that appears VERBATIM
    * in the benchmark set — the leak surface [[decontaminate]] (whole-doc
    * fingerprints) and [[contaminationReport]] (gram counts) can't
    * localize. A benchmark question quoted inside an otherwise-fine
    * training doc should cost a SPAN, not the document: this emits
    * `(idCol, start_tok, end_tok, span_tokens, n_windows)` per leak
    * (0-based token offsets, `end_tok` exclusive — the regions a pipeline
    * masks before pre-training), so whole-doc dropping becomes targeted
    * surgery.
    *
    * Plan: benchmark windows (tiny by nature — eval suites) distinct into
    * a broadcast set of 8-byte fingerprints; the training corpus explodes
    * to one [[graft.functions.NGramPolyHash]] fingerprint per token
    * position and semi-joins MAP-SIDE against the broadcast (no shuffle
    * of the corpus — same shape as [[decontaminate]]); only the (small)
    * leak hits shuffle once for the per-doc islands merge
    * ([[graft.x.Dedup.mergeWindowExtents]]). A benchmark side too big to
    * broadcast composes with the Bloom prefilter exactly like
    * [[bloomDecontaminate]]. */
  def passageDecontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, windowTokens: Int): DataFrame = {
    val bfp = graft.x.Dedup.passageWindows(benchmark, textCol, idCol, windowTokens)
      .select(col("__fp")).distinct()
    val hits = graft.x.Dedup.passageWindows(train, textCol, idCol, windowTokens)
      .join(broadcast(bfp), Seq("__fp"), "left_semi")
    graft.x.Dedup.mergeWindowExtents(hits, idCol, windowTokens)
  }

  /** Apply masking extents to documents: drop every token inside a
    * `[start_tok, end_tok)` span of `extents` (the
    * [[passageDecontaminate]] / [[graft.x.Dedup.repeatedPassages]] output
    * shape) — the surgery step that turns localized leaks and boilerplate
    * into clean training text. Documents WITHOUT extents pass through
    * byte-identical; masked documents are rebuilt from their surviving
    * tokens (single-space joined — the tokenization the extents were
    * computed against).
    *
    * Plan: extents collect per doc into a (tiny-per-doc) span array and
    * join on the doc id — no hint, so Catalyst broadcasts when the leak
    * set is small (the decontamination case) and shuffle-joins when a
    * boilerplate-heavy corpus puts extents in most docs. The rebuild is a
    * codegen'd `filter((tok, i) => !exists(spans, …))` over the token
    * array — no explode of the corpus. */
  def maskSpans(df: DataFrame, extents: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spans = extents.groupBy(col(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .withColumn("masked",
        when(col("__spans").isNull, col(textCol)).otherwise(
          concat_ws(" ", filter(split(trim(col(textCol)), "\\s+"), (t, i) =>
            !exists(col("__spans"), s =>
              i >= s.getField("start_tok").cast("int") &&
                i < s.getField("end_tok").cast("int"))))))
      .drop("__spans")
  }

  /** Bloom-filter decontamination — same contract and EXACT same result as
    * [[decontaminate]], with the benchmark set carried as a Bloom filter
    * instead of an exact broadcast set. Why it exists: at 100 TB the
    * benchmark/blocklist side can reach 10⁸–10⁹ fingerprints; a 1%-fpp
    * Bloom filter holds 10⁹ entries in ~1.2 GB (an exact hash set needs
    * ~10× that), so it still fits in every executor. The probe is then a
    * map-side FILTER over the corpus — no shuffle, no join — and only the
    * tiny bloom-positive slice pays a join:
    *
    *   clean = ¬bloom(fp)                      (sound: no false negatives)
    *   ∪ bloom(fp) ∧ fp ∉ benchmark            (bloom false positives, via
    *                                            anti-join of the suspects)
    *
    * which equals the exact anti-join by construction — the approximation
    * lives in the data structure, never in the answer. The probe is
    * Spark's own codegen'd `BloomFilterMightContain` over a
    * `BloomFilterAggregate`-built filter (via
    * [[graft.functions.BloomProbe]]), so the corpus-side filter stays
    * inside whole-stage codegen — no ScalaUDF boundary per row — and the
    * filter binary rides a scalar subquery computed once and reused by
    * both probe sites. */
  def bloomDecontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bfp = benchmark.select(fingerprint(col(textCol)).as("__fp")).distinct()
    val bloomDf = bfp.filter(col("__fp").isNotNull)
      .agg(graft.functions.BloomProbe.bloomAgg(col("__fp"), expectedItems, fpp)
        .as("__bloom"))
    def probe = graft.functions.BloomProbe.mightContain(bloomDf, col("__fp"))
    val fps = train.withColumn("__fp", fingerprint(col(textCol)))
    // NULL text ⇒ NULL fingerprint ⇒ the null-intolerant probe returns
    // NULL, which would fail BOTH filters and silently drop the row. The
    // exact anti-join keeps NULL-fp rows (a NULL key never matches), so the
    // clean branch must keep them too: a NULL fingerprint cannot be in the
    // set.
    val clean = fps.filter(coalesce(!probe, lit(true)))
    val falsePositives = fps.filter(coalesce(probe, lit(false)))
      .join(broadcast(bfp), Seq("__fp"), "left_anti")
    clean.unionByName(falsePositives).drop("__fp")
  }

  /** Per-document benchmark-contamination report: the fraction of each
    * training document's distinct word n-grams that also occur anywhere in
    * the benchmark set — the GPT-3-style n-gram-overlap analysis that
    * complements [[decontaminate]]: exact-fingerprint decontamination
    * removes verbatim copies, while the overlap fraction SURFACES partial
    * leaks (a benchmark question quoted inside a larger page) and
    * quantifies how much, so a pipeline can threshold, audit, or stratify
    * instead of only dropping.
    *
    * Shape: the benchmark's distinct gram hashes broadcast (benchmarks are
    * small relative to the corpus by definition); the corpus explodes to
    * hashed shingles ONCE (fused [[graft.functions.NGramPolyHash]] — no
    * gram strings) and a map-side left join + per-doc count-aggregation
    * produces one row per document. One shuffle, keyed by document. */
  def contaminationReport(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val bg = graft.x.Dedup.shingleHashes(benchmark, textCol, idCol, n)
      .select(col("__sh")).distinct().withColumn("__hit", lit(1))
    graft.x.Dedup.shingleHashes(train, textCol, idCol, n)
      .join(broadcast(bg), Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_contaminated"))
      .withColumn("overlap_frac",
        round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 4))
  }

  /** Unigram language-model surprisal — the cheap perplexity proxy for
    * quality filtering: score(doc) = mean −ln p(token) under the corpus's
    * own unigram distribution. Gibberish / rare-token-stuffed documents
    * score high, natural text low. Two shuffles: (a) global token counts
    * (map-side combine), (b) per-(doc, token) counts; the per-token log
    * weight joins back on the token (Catalyst broadcasts when the vocab
    * is small; at 100 TB the vocab table shuffles once and heavy hitters
    * dominate their partitions harmlessly — counts, not documents).
    *
    * Determinism across engines: ln() values are quantized to
    * DECIMAL(18,8) BEFORE summation, so the aggregate is exact integer
    * arithmetic — immune to the FP-addition association order that a
    * distributed sum cannot pin down — and the DuckDB oracle reproduces
    * every score bit-for-bit. */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // `tf` feeds both the vocab aggregation and the final join, and
    // `vocab` feeds both the total and the join — under executor memory
    // pressure, lineage re-execution would re-run the tokenize+explode
    // scan per consumer. Stage them once (tf is counts, not documents —
    // small relative to the corpus).
    val tf = staging.stage(
      toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c")), "ulp-tf")
    val vocab = staging.stage(
      tf.groupBy("tok").agg(sum("c").as("gc")), "ulp-vocab")
    val total = vocab.agg(sum("gc").as("__n"))
    // single rounding step: the raw IEEE -ln() double is cast straight to
    // DECIMAL(18,8) (round(double, 8) first would double-round — the
    // rounded double can't represent the 8-decimal value, and engines
    // disagree on the re-round)
    val nll = (-log(col("gc").cast("double") / col("__n").cast("double")))
      .cast("decimal(18,8)")
    // c narrowed to decimal(10,0): decimal(18,8) × bigint would need
    // precision 39 > 38, and Spark's allowPrecisionLoss default silently
    // drops the product to scale 7 — a 1e-8-level error per token that
    // breaks the exact-sum contract. 18+10+1 = 29 keeps scale 8 exact.
    tf.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("__nll", nll * col("c").cast("decimal(10,0)"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"),
        (sum("__nll").cast("double") / sum("c").cast("double")).as("mean_nll"))
  }

  /** Per-document mean negative log-likelihood under an add-one-smoothed
    * BIGRAM model trained on the corpus itself — the KenLM-style fluency
    * proxy one tier above [[unigramLogProb]]: word salad and shuffled
    * boilerplate keep plausible unigram stats but improbable transitions,
    * so they surface here and not there. `P(w2|w1) = (c(w1 w2) + 1) /
    * (ctx(w1) + V)` with `ctx` = bigram-prefix count and `V` = corpus
    * vocabulary size; documents with fewer than two tokens have no
    * transitions and drop out.
    *
    * Determinism contract (shared with [[unigramLogProb]]): each
    * transition's raw IEEE -ln() double is cast ONCE to DECIMAL(18,8);
    * per-doc sums are exact decimal arithmetic, so the mean is the same
    * on every engine and partitioning and the oracle can replay it.
    *
    * Shape at 100 TB: one (doc, bigram) aggregation, one corpus bigram
    * aggregation (map-side combined; bigram types grow sub-linearly in
    * corpus size), prefix counts derived FROM the bigram table (no second
    * corpus pass), V and the token total as one broadcast scalar row.
    * Joins are keyed by bigram/prefix — co-partitioned with the counts
    * they enrich. */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val a = col("__a")
    val toksArr = df.select(col(idCol),
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__a"))
    val bigrams = toksArr
      .select(col(idCol), explode(when(size(a) >= 2,
          transform(sequence(lit(1), size(a) - 1),
            i => struct(element_at(a, i).as("w1"), element_at(a, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val docBig = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val corpusBig = docBig.groupBy("w1", "w2").agg(sum("c").as("gb"))
    val ctx = corpusBig.groupBy("w1").agg(sum("gb").as("cw1"))
    val vocab = toksArr
      .select(explode(a).as("tok")).agg(countDistinct("tok").as("__v"))
    val nll = (-log((col("gb") + 1).cast("double") /
        (col("cw1") + col("__v")).cast("double"))).cast("decimal(18,8)")
    docBig.join(corpusBig, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__nll", nll * col("c").cast("decimal(10,0)"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_bigrams"),
        (sum("__nll").cast("double") / sum("c").cast("double")).as("mean_nll"))
  }

  /** Repetition statistics (Gopher-style quality rules): unique-token
    * ratio and the share of the single most frequent token. Highly
    * repetitive documents (boilerplate, keyword stuffing, degenerate
    * generations) show low uniq_ratio / high top_share. One shuffle (per
    * (doc, token) counts with map-side combine); everything else narrow. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
      minUniqRatio: Double = 0.3, maxTopShare: Double = 0.2): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val stats = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_uniq"),
        max("c").as("top_count"))
    stats.select(
      col(idCol),
      col("n_tokens"),
      (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
      (col("top_count").cast("double") / col("n_tokens")).as("top_share"))
      .withColumn("keep",
        col("uniq_ratio") >= minUniqRatio && col("top_share") <= maxTopShare)
  }

  /** Gopher-style n-gram repetition metrics — the two rules from the
    * published quality suite (Rae et al. 2021, table A1) that token-level
    * [[repetitionStats]] cannot express:
    *
    *  - `top_share`: characters covered by the occurrences of the single
    *    most frequent REPEATED `topN`-gram / total token characters (0
    *    when no `topN`-gram occurs twice — a gram seen once is length, not
    *    repetition; ties broken by covered characters, so the metric is
    *    deterministic);
    *  - `dup_frac`: characters at token positions covered by at least one
    *    `dupN`-gram that occurs more than once in the document, counting
    *    each position ONCE (the union of covered extents, not the sum —
    *    overlapping repeats don't double-bill).
    *
    * Boilerplate listings, keyword stuffing and degenerate generations
    * score high on both while keeping a healthy unique-TOKEN ratio, which
    * is exactly why the n-gram rules exist alongside the token rules.
    *
    * Shape at 100 TB: every aggregation/join in here is keyed by the
    * document id (or (id, gram-hash) with map-side partial aggregation),
    * so the shuffled bytes are token-position rows for ONE document class
    * at a time — nothing global, no self-join, linear in corpus size.
    * Grams travel as fused 8-byte [[graft.functions.NGramPolyHash]] keys,
    * never strings (the same reason the near-dup family hashes shingles:
    * gram text is ~5× the tokens it covers and would dominate the
    * shuffle); the oracle replays the identical hash, so a within-doc
    * hash collision — ~2⁻⁵⁵ per gram pair — cannot cause a divergence.
    * Token totals are a narrow higher-order fold (no shuffle). Docs
    * shorter than `n` tokens have no repeatable n-grams: both metrics are
    * 0 and the doc is kept. */
  def ngramRepetitionStats(df: DataFrame, textCol: String, idCol: String,
      topN: Int = 2, dupN: Int = 5,
      maxTopShare: Double = 0.2, maxDupFrac: Double = 0.3): DataFrame = {
    val a = col("__a")
    val ls = col("__ls")
    val toks = df.select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__a"))
      .withColumn("__ls", transform(a, t => length(t).cast("long")))
    // total token characters (spaces excluded) — narrow fold, no shuffle
    val totals = toks.select(col(idCol),
      aggregate(ls, lit(0L), (acc, x) => acc + x).as("n_chars"))
    // n-gram occurrences: (start, 8-byte gram hash, token chars covered,
    // span) — NGramPolyHash emits one whole-doc gram for docs shorter
    // than n; it can never repeat within the doc, so the c >= 2 filters
    // below discard it and short docs score 0 on both metrics
    def occurrences(n: Int): DataFrame =
      toks.select(col(idCol), ls,
          posexplode(graft.functions.NGramPolyHash(a, n)).as(Seq("__p0", "gh")))
        .select(col(idCol), (col("__p0") + 1).as("start"), col("gh"),
          aggregate(slice(ls, col("__p0") + 1, least(lit(n), size(ls))),
            lit(0L), (acc, x) => acc + x).as("chars"),
          least(lit(n), size(ls)).as("span"))
    // most frequent repeated topN-gram: chars covered by its occurrences
    val top = occurrences(topN)
      .groupBy(col(idCol), col("gh"))
      .agg(count(lit(1)).as("c"), max("chars").as("gchars"))
      .filter(col("c") >= 2)
      .select(col(idCol), struct(col("c"),
        (col("c") * col("gchars")).as("chars")).as("s"))
      .groupBy(col(idCol)).agg(max(col("s")).as("m"))
      .select(col(idCol), col("m.chars").as("top_chars"))
    // union of token positions covered by duplicated dupN-grams
    val dupOcc = occurrences(dupN)
    val dupGrams = dupOcc.groupBy(col(idCol), col("gh"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).drop("c")
    val posLen = toks.select(col(idCol), posexplode(ls).as(Seq("p0", "l")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("l"))
    val dupChars = dupOcc.join(dupGrams, Seq(idCol, "gh"))
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + col("span") - 1)).as("p"))
      .distinct()
      .join(posLen, Seq(idCol, "p"))
      .groupBy(col(idCol)).agg(sum("l").as("dup_chars"))
    totals
      .join(top, Seq(idCol), "left")
      .join(dupChars, Seq(idCol), "left")
      .select(col(idCol), col("n_chars"),
        when(col("n_chars") === 0, 0.0).otherwise(
          coalesce(col("top_chars"), lit(0L)).cast("double") / col("n_chars"))
          .as("top_share"),
        when(col("n_chars") === 0, 0.0).otherwise(
          coalesce(col("dup_chars"), lit(0L)).cast("double") / col("n_chars"))
          .as("dup_frac"))
      .withColumn("keep",
        col("top_share") <= maxTopShare && col("dup_frac") <= maxDupFrac)
  }

  /** Stupid-backoff trigram fluency scoring (Brants et al., "Large
    * Language Models in Machine Translation", EMNLP 2007) — the trigram
    * tier of the x59 fluency stack, scored against a SEPARATE reference
    * corpus `lm` so the backoff chain actually fires (self-scoring never
    * backs off: every observed trigram has count ≥ 1 in its own corpus).
    *
    * Per trigram occurrence (w1 w2 w3):
    *   c3 > 0         →  s = ln(c3(w1w2w3) / c2(w1w2))
    *   else c2 > 0    →  s = ln(α · c2(w2w3) / c1(w2))
    *   else           →  s = ln(α² · (c1(w3)+1) / (N+V))   (add-one tail)
    * with α = 0.4 as published. Each tier's log is cast ONCE to
    * DECIMAL(18,8); per-doc sums are exact decimal arithmetic, so
    * `mean_nll = −Σs / n_trigrams` is engine-replayable (one final IEEE
    * division, fixed association — the x30/x59 contract).
    *
    * Scale shape: LM count tables are corpus-keyed aggregates with
    * map-side partials; the doc-side joins key on gram columns
    * (co-partitioned shuffle joins — a trigram table is corpus-sized, so
    * none of them is broadcastable by design), then ONE doc-keyed
    * aggregate. Documents shorter than 3 tokens have no trigrams and drop
    * out, mirroring x59's ≥2-token contract.
    */
  def stupidBackoffLogProb(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String, alpha: Double = 0.4): DataFrame = {
    val a = col("__a")
    def toksArr(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+
        filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__a"): _*)
    def grams(df: DataFrame, n: Int, cols: Column*): DataFrame = {
      val fields = (0 until n).map(j => element_at(a, col("__i") + j).as(s"w${j + 1}"))
      toksArr(df, cols: _*)
        .select(cols ++ Seq(a,
          explode(when(size(a) >= n, sequence(lit(1), size(a) - (n - 1)))
            .otherwise(array().cast("array<int>"))).as("__i")): _*)
        .select(cols ++ fields: _*)
    }
    val uni = grams(lm, 1).groupBy("w1").agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum("c1").as("__n_lm"), count(lit(1)).as("__v_lm"))
    val big = grams(lm, 2).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val tri = grams(lm, 3).groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val docTri = grams(docs, 3, col(idCol))
      .groupBy(col(idCol), col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))
    val s =
      when(col("c3").isNotNull,
        log(col("c3").cast("double") / col("ctx12").cast("double")))
      .when(col("b23").isNotNull,
        log(lit(alpha) * col("b23").cast("double") / col("u2").cast("double")))
      .otherwise(
        log(lit(alpha * alpha) * (coalesce(col("u3"), lit(0L)) + 1).cast("double") /
          (col("__n_lm") + col("__v_lm")).cast("double")))
    docTri
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(big.select(col("w1"), col("w2"), col("c2").as("ctx12")), Seq("w1", "w2"), "left")
      .join(big.select(col("w1").as("w2"), col("w2").as("w3"), col("c2").as("b23")),
        Seq("w2", "w3"), "left")
      .join(uni.select(col("w1").as("w2"), col("c1").as("u2")), Seq("w2"), "left")
      .join(uni.select(col("w1").as("w3"), col("c1").as("u3")), Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s", (-s).cast("decimal(18,8)") * col("c").cast("decimal(10,0)"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_trigrams"),
        (sum("__s").cast("double") / sum("c").cast("double")).as("mean_nll"))
  }

  /** Skip-gram training-pair extraction with frequency subsampling
    * (Mikolov et al. 2013): the word2vec/embedding-training preprocessing
    * step — drop each token occurrence of word w with the published
    * keep-probability `p(w) = min(1, √(t/f(w)) + t/f(w))`, re-compact the
    * surviving sequence, then emit (center, context) pairs within
    * `window` positions of the compacted sequence (word2vec pairs AFTER
    * subsampling, which is why frequent-word windows effectively widen).
    *
    * Determinism: the drop decision is a salted portable hash of
    * (id, pos) against `floor(p·2^55)` — an exact integer comparison, so
    * the emitted pair multiset is identical under any partitioning,
    * retry, or engine (the [[Sampling.weightedSample]] discipline; no
    * RNG anywhere). Scale shape: frequency table = one vocabulary-keyed
    * agg broadcast back; compaction = one doc-keyed window (per-document
    * frames); pairing = offsets exploded into an equi-join on
    * (doc, position) — co-partitioned, never a per-doc cross join; the
    * final (center, context) count has map-side partials.
    */
  def skipgramPairs(df: DataFrame, textCol: String, idCol: String,
      window: Int = 2, subsampleT: Double = 1e-3, salt: String = "sg"): DataFrame = {
    require(window >= 1, s"skipgramPairs needs window >= 1, got $window")
    val toks = df.select(col(idCol),
        posexplode(filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val n = freq.agg(sum("c").as("__n"))
    // keep-threshold per word, ONE double chain then floor to an integer
    val thresh = freq.crossJoin(broadcast(n)).select(col("tok"), {
      val f = col("c").cast("double") / col("__n").cast("double")
      val p = least(lit(1.0), sqrt(lit(subsampleT) / f) + lit(subsampleT) / f)
      floor(p * lit(3.6028797018963968e16)).cast("decimal(19,0)").as("__keep")
    })
    val kept = toks.join(thresh, Seq("tok"))
      .filter(graft.functions.PolyHash56(concat(col(idCol).cast("string"), lit(":"),
        col("pos").cast("string"), lit(":" + salt))).cast("decimal(19,0)") < col("__keep"))
    val compacted = kept.withColumn("np", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .select(col(idCol), col("np"), col("tok"))
    val offsets = ((-window to window).filter(_ != 0)).map(o => lit(o))
    val centers = compacted
      .withColumn("__off", explode(array(offsets: _*)))
      .select(col(idCol), col("tok").as("center"), (col("np") + col("__off")).as("np"))
    centers.join(compacted, Seq(idCol, "np"))
      .groupBy(col("center"), col("tok").as("context"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** PMI collocation extraction (Church & Hanks 1990): bigrams whose
    * observed frequency beats the independence assumption —
    * `pmi(w1,w2) = ln( (c2/B) / ((c1(w1)/N)·(c1(w2)/N)) )` — the classic
    * corpus-analysis step for multi-word expressions ("new york",
    * "machine learning") before tokenizer/vocab decisions. `minCount`
    * drops the unstable low-frequency tail (PMI's known bias toward
    * hapax pairs).
    *
    * Exactness: counts are integers; each pair's PMI is ONE double
    * expression with fixed association, quantized to DECIMAL(18,8) at the
    * end — no distributed float accumulation anywhere. Scale shape: one
    * bigram aggregate and one unigram aggregate (map-side partials), the
    * bigram table joins unigram counts on w1 and w2 (gram-keyed shuffle
    * joins — vocabulary tables, not corpus tables), totals broadcast.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5): DataFrame = {
    val a = col("__a")
    val toksArr = df.select(
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__a"))
    val uni = toksArr.select(explode(a).as("w")).groupBy("w").agg(count(lit(1)).as("c1"))
    val bigAll = toksArr
      .select(explode(when(size(a) >= 2, transform(sequence(lit(1), size(a) - 1),
          i => struct(element_at(a, i).as("w1"), element_at(a, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val totals = uni.agg(sum("c1").as("__n"))
    // B counts ALL bigram events — the probability space — not just the
    // pairs that survive minCount
    val btot = bigAll.agg(sum("c2").as("__b"))
    bigAll.filter(col("c2") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c1").as("cw1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("cw2")), Seq("w2"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(btot))
      .select(col("w1"), col("w2"), col("c2").cast("long").as("c2"),
        log((col("c2").cast("double") / col("__b").cast("double")) /
            ((col("cw1").cast("double") / col("__n").cast("double")) *
             (col("cw2").cast("double") / col("__n").cast("double"))))
          .cast("decimal(18,8)").cast("double").as("pmi"))
  }

  /** DSIR-style importance weighting for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every raw document by how much more likely its
    * hashed-unigram bag is under a target-domain distribution than under
    * the raw-corpus distribution, then resample by Gumbel-perturbed
    * log-weights — the standard "pick web documents that look like
    * Wikipedia" pre-training selection step.
    *
    * Mechanics: tokens hash into `nBuckets` [[graft.functions.PolyHash56]]
    * buckets; each bucket's add-one-smoothed log-likelihood ratio
    * `λ_b = ln(p_target(b) / p_raw(b))` is computed once on the ≤nBuckets-row
    * stats frame and quantized ONCE to DECIMAL(18,8), so per-document
    * weights `llr = Σ_tokens λ_bucket` are EXACT decimal sums — identical
    * under any partitioning and engine-replayable. The Gumbel key derives
    * from a salted portable hash of the id (never an RNG): `sel_key =
    * llr + (-ln(-ln(u)))` with `u = (hash+0.5)/2^55`, also quantized to
    * decimal, so top-n resampling is a deterministic exact-decimal ranking.
    *
    * Scale shape: the corpus pays ONE (id, bucket)-level shuffle (map-side
    * partial counts); bucket stats are two ≤nBuckets-row aggregates whose
    * λ table broadcasts back; selection via [[dsirResample]] compiles to
    * TakeOrderedAndProject (per-partition top-n heaps, driver merges n
    * rows) — nothing global ever materializes. Zero-token documents have
    * no bag and drop out (they cannot be selected).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, nBuckets: Int = 4096, salt: String = "dsir"): DataFrame = {
    require(nBuckets > 0, "dsirWeights needs nBuckets > 0")
    val b = lit(nBuckets.toLong)
    def buckets(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"): _*)
        .filter(length(col("tok")) > 0)
        .select(cols :+ pmod(graft.functions.PolyHash56(col("tok")), b).as("bucket"): _*)
    // per-doc bucket bags: the only corpus-sized shuffle in the operator
    val docBuckets = buckets(raw, col(idCol))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
    val rc = docBuckets.groupBy("bucket").agg(sum("c").as("rc"))
    val tc = buckets(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
    val grid = raw.sparkSession.range(nBuckets.toLong).select(col("id").as("bucket"))
    val counts = grid
      .join(rc, Seq("bucket"), "left").join(tc, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val totals = counts.agg(sum("rc").as("rtot"), sum("tc").as("ttot"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        log(((col("tc") + 1).cast("double") / (col("ttot") + b).cast("double")) /
            ((col("rc") + 1).cast("double") / (col("rtot") + b).cast("double")))
          .cast("decimal(18,8)").as("lam"))
    val u = (graft.functions.PolyHash56(
      concat(col(idCol).cast("string"), lit(":" + salt))).cast("double") + lit(0.5)) /
      lit(3.6028797018963968e16) // 2^55: hash is 55-bit, so u ∈ (0,1) strictly
    docBuckets
      .join(broadcast(lam), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum("c").cast("long").as("n_tokens"),
        // the raw decimal sum is (38,8); re-bound to (20,8) (|llr| ≤ ~4e7
        // even at 1e6 tokens/doc) so adding the (18,8) Gumbel key below
        // stays under precision 38 — Spark would otherwise silently drop
        // the 8th decimal digit to fit (38,7)
        sum(col("lam") * col("c").cast("decimal(10,0)")).cast("decimal(20,8)").as("llr"))
      .withColumn("sel_key", col("llr") + (-log(-log(u))).cast("decimal(18,8)"))
  }

  /** Gumbel top-n resampling over [[dsirWeights]]: equivalent to sampling
    * n documents without replacement with probability ∝ exp(llr). The
    * order-by-limit compiles to a per-partition heap + driver merge. */
  def dsirResample(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, n: Int, nBuckets: Int = 4096, salt: String = "dsir"): DataFrame =
    dsirWeights(raw, target, textCol, idCol, nBuckets, salt)
      .orderBy(col("sel_key").desc, col(idCol)).limit(n)

  /** Exact sparse cosine-similarity self-join over raw term-frequency
    * vectors, via the inverted index (Baeza-Yates/Zobel's document-at-a-
    * time turned term-at-a-time): explode (doc, term, tf), join on term,
    * accumulate integer partial dot products, then ONE double op per
    * surviving pair. Complements [[graft.x.Similarity.cosineNearDupPairs]]
    * (dense embeddings) and [[graft.x.Dedup.ngramJaccardPairs]] (set
    * semantics): tf-weighted cosine catches documents that repeat the same
    * vocabulary at the same RATES — paraphrase-level duplication where the
    * gram sets already diverge.
    *
    * Exactness through the shuffle: dot products and squared norms are
    * integer sums (associative, layout-independent); `cos = dot /
    * √(na·nb)` happens once per pair with both operands exact — the oracle
    * divides identical integers. Norms use the CAPPED vectors, so the
    * measure is self-consistent under `maxDocFreq`.
    *
    * Shape at 100 TB: the term join is the dominant shuffle and fans out
    * quadratically on corpus-hot terms. TWO levers bound it: `n` > 1
    * makes the terms word n-grams — far more discriminative, so document
    * frequencies collapse (measured on the fixture corpus: unigram terms
    * live in ~every document and the join builds ~n²/4 pairs; 3-gram
    * terms cut candidate pairs ~700×) — and `maxDocFreq` drops terms
    * present in more documents than the cap (classic stopword pruning: a
    * term in half the corpus carries no similarity signal but a
    * quadratic join bill). Hashed grams ([[graft.functions.NGramPolyHash]])
    * keep the shuffle to 8-byte longs; docs shorter than `n` tokens
    * contribute one whole-doc gram ([[graft.x.Dedup.shingles]]' rule). */
  def tfCosinePairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, n: Int = 1, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val toks = df.select(col(idCol).as("id"),
        explode(graft.functions.NGramPolyHash(
          filter(split(lower(trim(col(textCol))), "\\s+"),
            t => length(t) > 0), n)).as("__t"))
    val tf = toks.groupBy("id", "__t").agg(count(lit(1)).as("tf"))
    val kept =
      if (maxDocFreq == Int.MaxValue) tf
      else tf.join(tf.groupBy("__t").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDocFreq).select("__t"), "__t")
    val n2 = kept.groupBy("id").agg(sum(col("tf") * col("tf")).as("n2"))
    val dot = kept.select(col("__t"), col("id").as("id_a"), col("tf").as("tf_a"))
      .join(kept.select(col("__t"), col("id").as("id_b"), col("tf").as("tf_b")),
        "__t")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("tf_a") * col("tf_b")).as("__d"))
    dot
      .join(n2.select(col("id").as("id_a"), col("n2").as("__na")), "id_a")
      .join(n2.select(col("id").as("id_b"), col("n2").as("__nb")), "id_b")
      // na·nb as double BEFORE the product: two ~1e10 long norms overflow
      // int64 multiplied, and the sqrt is double anyway
      .withColumn("cos", col("__d").cast("double") /
        sqrt(col("__na").cast("double") * col("__nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Gopher-style document quality rules (Rae et al. 2021, appendix A —
    * the public ruleset behind most LLM corpus gates): word-count range,
    * mean-word-length range, minimum fraction of words containing a
    * letter, minimum stopword hits. Every flag is computed in PURE
    * integer arithmetic — thresholds are cross-multiplied (`chars ≥
    * 3·words` instead of `chars/words ≥ 3.0`), so there is no float
    * boundary to disagree across engines, ever. Narrow projection, zero
    * shuffles, full codegen; `pass` is the conjunction.
    *
    * The rule constants that are ratios are fixed by the published
    * ruleset (mean word length 3–10, ≥80% alphabetic, ≥2 stopwords);
    * the corpus-dependent word-count range is parameterized. */
  def gopherQualityFlags(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val nWords = size(toks).cast("long")
    val nChars = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val alphaCnt = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val stopCnt = size(filter(toks,
      t => t.isInCollection(GopherStopwords))).cast("long")
    df.select(col(idCol),
      nWords.as("n_words"), nChars.as("n_chars"),
      alphaCnt.as("n_alpha_words"), stopCnt.as("n_stop_hits"),
      nWords.between(minWords, maxWords).as("wc_ok"),
      (nChars >= nWords * 3 && nChars <= nWords * 10).as("mwl_ok"),
      (alphaCnt * 10 >= nWords * 8).as("alpha_ok"),
      (stopCnt >= 2).as("stop_ok"))
      .withColumn("pass",
        col("wc_ok") && col("mwl_ok") && col("alpha_ok") && col("stop_ok"))
  }

  /** The Gopher rule's stopword probe set (a presence check, not a
    * linguistic inventory — the published rule uses exactly this kind of
    * tiny high-frequency list). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  /** Corpus word inventory for BPE learning: distinct lowercased words
    * with occurrence counts and their symbol sequence (single characters
    * to start). BPE statistics are per-WORD-TYPE, so everything downstream
    * runs on the vocabulary (≪ corpus) — the one corpus-sized pass is
    * this count. */
  def bpeWordInventory(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // split on "" leaves a zero-width trailing element under limit=-1
      .withColumn("syms",
        filter(split(col("word"), ""), x => length(x) > 0))

  /** Adjacent symbol-pair statistics for one BPE round: (s1, s2, total
    * occurrence count weighted by word frequency), the quantity whose
    * argmax is the next merge. Narrow explode over the vocabulary + one
    * pair-keyed agg with map-side partials. */
  def bpePairCounts(inventory: DataFrame): DataFrame =
    inventory
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("s1"),
          element_at(col("syms"), i + 1).as("s2")))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Byte-pair-encoding merge learning (Sennrich et al., ACL 2016 — the
    * public algorithm behind most LLM tokenizers): count adjacent pairs,
    * merge the argmax (ties broken by (s1, s2) order, so the sequence is
    * deterministic on any engine/layout), repeat `k` times. Returns the
    * learned merges in order.
    *
    * Rounds are BATCHED: one vocabulary-scale job collects the top pairs,
    * and the driver applies the longest sorted PREFIX p1..pm (m ≤
    * `maxBatch`) that is provably order-equivalent to m sequential argmax
    * rounds, so tokenizer-scale k needs ~⌈k/m⌉ jobs, not k. The prefix is
    * safe when (a) the pairs are pairwise symbol-disjoint — each pj's
    * count is then unchanged by the earlier merges; (b) each pj has
    * s1 ≠ s2 and a concatenation that is a FRESH symbol (not in the
    * current vocabulary or the batch) — pairs involving a merged symbol
    * are then genuinely new, and each of their occurrences consumes an
    * occurrence of a non-batch progenitor pair ((x,s1)→(x,s1s2) or
    * (s2,y)→(s1s2,y)), bounding their counts by c(m+1); and (c)
    * c(m) > c(m+1) strictly — so neither surviving old pairs (counts only
    * decrease) nor new pairs can outrank any pj mid-batch, even by
    * tie-break. A prefix of 1 is always exact (it IS the sequential
    * step), so adversarial inputs degrade to the unbatched sequence,
    * never to a different one.
    *
    * BPE statistics are per word TYPE: the one corpus-sized pass is
    * [[bpeWordInventory]]'s count; every round after runs on the
    * vocabulary (≪ corpus), and at 100 TB the batching matters because k
    * driver round-trips at tokenizer scale (32k merges) would dominate.
    * The merge rewrite is a typed map over symbol arrays (greedy
    * left-to-right, the reference semantics — genuinely imperative, so a
    * Dataset map rather than a contorted expression). */
  def bpeMerges(df: DataFrame, textCol: String, k: Int,
      maxBatch: Int = 16): Seq[(String, String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    var inv = bpeWordInventory(df, textCol)
      .select(col("cnt"), col("syms")).as[(Long, Seq[String])]
      .cache()
    // Superset of the live symbol vocabulary: initial characters + every
    // merge made so far. Superset is safe — the freshness check in (b)
    // only gets more conservative — and it keeps vocabulary maintenance
    // off the cluster after this one job.
    val vocab = scala.collection.mutable.Set[String](
      inv.select(explode(col("syms"))).distinct().as[String].collect().toSeq: _*)
    val merges = Seq.newBuilder[(String, String, Long)]
    var learned = 0
    var exhausted = false
    while (learned < k && !exhausted) {
      // +1 beyond the largest admissible batch: condition (c) needs c(m+1)
      val fetch = maxBatch.max(1) + 1
      val top = bpePairCounts(inv.toDF("cnt", "syms"))
        .orderBy(col("cnt").desc, col("s1"), col("s2")).limit(fetch)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val want = (k - learned).min(maxBatch.max(1)).min(
          if (top.length < fetch) top.length else top.length - 1)
        // longest safe prefix: scan forward while (a)/(b) hold, then trim
        // to the last position with a strict count gap to its successor
        val used = scala.collection.mutable.Set[String]()
        var scanned = 0
        var valid = true
        while (valid && scanned < want) {
          val (s1, s2, _) = top(scanned)
          valid = s1 != s2 && !used(s1) && !used(s2) && !used(s1 + s2) &&
            !vocab(s1 + s2)
          if (valid) { used += s1; used += s2; used += (s1 + s2); scanned += 1 }
        }
        var m = scanned
        while (m > 1 && m < top.length && top(m - 1)._3 <= top(m)._3) m -= 1
        if (m < 1) m = 1 // a single merge needs no safety conditions
        val batch = top.take(m)
        batch.foreach { case (s1, s2, c) =>
          merges += ((s1, s2, c)); vocab += (s1 + s2)
        }
        learned += m
        val bArr = batch.map { case (s1, s2, _) => (s1, s2) }
        val prev = inv
        inv = prev.map { case (cnt, syms) =>
          var cur = syms
          bArr.foreach { case (s1, s2) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < cur.length) {
              if (i + 1 < cur.length && cur(i) == s1 && cur(i + 1) == s2) {
                out += s1 + s2; i += 2
              } else { out += cur(i); i += 1 }
            }
            cur = out.toSeq
          }
          (cnt, cur)
        }.cache()
        prev.unpersist()
      }
    }
    inv.unpersist()
    merges.result()
  }

  /** Apply learned BPE merges ([[bpeMerges]]) to the corpus and report
    * the post-merge token count per document — the tokenizer-true length
    * signal for budget planning once a vocabulary exists. Merges apply
    * in learned order, greedy left-to-right within each word (the
    * reference semantics). The merge list is driver-small and ships in
    * the closure; the pass is narrow (no shuffle). */
  def bpeSegment(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = Option(text).toSeq
          .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
        var n = 0L
        words.foreach { w =>
          var syms: Array[String] = w.split("").filter(_.nonEmpty)
          ms.foreach { case (s1, s2) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == s1 && syms(i + 1) == s2) {
                out += s1 + s2; i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.toArray
          }
          n += syms.length
        }
        (id, n)
      }.toDF(idCol, "n_bpe_tokens")
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form) — the principled sibling of
    * [[stupidBackoffLogProb]]: instead of a fixed backoff penalty, mass
    * discounted from seen bigrams is redistributed by CONTINUATION
    * probability (how many distinct contexts a word completes), which is
    * what makes "francisco" (frequent, one context) score below "report"
    * (less frequent, many contexts):
    *
    *   P(w2|w1) = max(c(w1,w2)−D, 0)/c(w1·)
    *              + [D·N1+(w1,·)/c(w1·)] · Pcont(w2)
    *   Pcont(w2) = (N1+(·,w2)+1) / (N1+(·,·)+V)
    *
    * with D = 0.75 (binary-exact), add-one on the continuation
    * distribution so unseen words keep a positive floor, and unseen-w1
    * rows falling back to Pcont alone. Per-doc `mean_nll` follows the
    * x94 determinism contract: −ln(p) truncated to DECIMAL(18,8) per
    * gram type, decimal-summed, one final IEEE division.
    *
    * Scale shape identical to x94: LM tables are corpus aggregates with
    * map-side partials; doc bigrams join them on gram keys
    * (co-partitioned, not broadcast — a bigram table is corpus-sized);
    * one doc-keyed aggregate ends the plan. Docs under 2 tokens drop. */
  def kneserNeyLogProb(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount $discount outside (0,1)")
    val a = col("__a")
    def toksArr(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+
        filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("__a"): _*)
    def bigrams(df: DataFrame, cols: Column*): DataFrame =
      toksArr(df, cols: _*)
        .select(cols ++ Seq(a,
          explode(when(size(a) >= 2, sequence(lit(1), size(a) - 1))
            .otherwise(array().cast("array<int>"))).as("__i")): _*)
        .select(cols ++ Seq(element_at(a, col("__i")).as("w1"),
          element_at(a, col("__i") + 1).as("w2")): _*)
    val big = bigrams(lm).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val ctx = big.groupBy("w1")
      .agg(sum("c2").as("c1dot"), count(lit(1)).as("n1plus"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("nctx"))
    val totals = big.agg(count(lit(1)).as("__ntypes"),
      countDistinct("w2").as("__v"))
    val docBig = bigrams(docs, col(idCol))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val pc = (coalesce(col("nctx"), lit(0L)) + 1).cast("double") /
      (col("__ntypes") + col("__v")).cast("double")
    val pSeen =
      when(col("c2").isNotNull,
        (col("c2").cast("double") - lit(discount)) / col("c1dot").cast("double"))
        .otherwise(lit(0.0)) +
      (lit(discount) * col("n1plus").cast("double") / col("c1dot").cast("double")) * pc
    val p = when(col("c1dot").isNotNull, pSeen).otherwise(pc)
    docBig
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s", (-log(p)).cast("decimal(18,8)") * col("c").cast("decimal(10,0)"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_bigrams"),
        (sum("__s").cast("double") / sum("c").cast("double")).as("mean_nll"))
  }

  /** Flesch reading-ease + Flesch–Kincaid grade (Flesch 1948; Kincaid
    * 1975) — the classic readability screens used as cheap quality
    * features in web-corpus curation (too-low reading ease flags
    * boilerplate/gibberish; grade level stratifies difficulty for
    * curriculum mixes). Syllables are approximated as vowel GROUPS
    * (`[aeiouy]+` runs) with a floor of 1 per word (zero-vowel tokens —
    * numbers, acronyms — count one); sentences as `[.!?]+` runs floored
    * at 1. Everything is regexp-count integer arithmetic plus two fixed
    * IEEE chains, so the scores replay exactly on the oracle.
    *
    * One narrow projection, no shuffle — [[profile]]'s shape. */
  def readabilityScores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = expr(
      s"filter(split(lower(trim($textCol)), '\\\\s+'), w -> length(w) > 0)")
    df.select(col(idCol), col(textCol), words.as("__w"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_words"),
        greatest(lit(1L),
          expr(s"size(regexp_extract_all($textCol, '[.!?]+', 0))").cast("long"))
          .as("n_sentences"),
        (expr(s"size(regexp_extract_all(lower($textCol), '[aeiouy]+', 0))")
          .cast("long") +
          expr("size(filter(__w, w -> NOT w rlike '[aeiouy]'))").cast("long"))
          .as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")), 4).as("flesch"),
        round(lit(0.39) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")) - lit(15.59), 4).as("fk_grade"))
  }

  /** Hill tail-index estimate (Hill 1975) of the token-frequency
    * distribution: over the k largest frequencies x₁ ≥ … ≥ x_k with
    * boundary x_{k+1},  α̂ = k / Σᵢ ln(xᵢ / x_{k+1}) — the standard
    * power-law exponent estimator, i.e. the "is this corpus still
    * Zipfian" health check (α̂ ≈ 1 for natural text; a corpus whose
    * head flattens after aggressive dedup or template stripping drifts
    * visibly). Reported with the vocabulary size, the boundary
    * frequency, and the head share so the number has its context.
    *
    * Order statistics come from a (freq DESC, token ASC) total order —
    * ties at the boundary are deterministic. The top-(k+1) cut is
    * TakeOrderedAndProject; the only window runs over those k+1 rows
    * (bounded by the parameter, never by data). Each ln term is
    * quantized to DECIMAL(18,8) before the sum (association-free); α̂
    * is one IEEE division. */
  def hillTailIndex(docs: DataFrame, textCol: String, k: Int = 200): DataFrame = {
    require(k >= 2, s"hillTailIndex needs k >= 2, got $k")
    val toks = docs.select(explode(
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0))
      .as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val vocab = freq.agg(count(lit(1)).as("__v"), sum("c").as("__tot"))
    val top = freq.orderBy(col("c").desc, col("tok")).limit(k + 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok"))
    val ranked = top.withColumn("__rn", row_number().over(w))
    val bdy = ranked.filter(col("__rn") === k + 1)
      .select(col("c").as("__xk1"))
    ranked.filter(col("__rn") <= k)
      .crossJoin(broadcast(bdy))
      .select(col("c"), col("__xk1"),
        log(col("c").cast("double") / col("__xk1").cast("double"))
          .cast("decimal(18,8)").as("__t"))
      .agg(sum("__t").as("__s"), sum("c").as("__head"),
        max("__xk1").as("__xk1"))
      .crossJoin(broadcast(vocab))
      .select(lit(k).as("k"), col("__v").cast("long").as("vocab"),
        col("__xk1").cast("long").as("boundary_freq"),
        round(col("__head").cast("double") / col("__tot").cast("double"), 6)
          .as("head_share"),
        round(when(col("__s") > 0,
          lit(k.toDouble) / col("__s").cast("double")), 6).as("alpha_hill"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): rank words by
    * running PageRank over the adjacency co-occurrence graph — the
    * unsupervised keyword/keyphrase baseline, here composed from the
    * engine's own primitives: tokenization (the [[skipgramPairs]] split
    * discipline), [[graft.functions.PolyHash56]] node ids (word → 55-bit
    * portable hash, so the graph layer stays BIGINT and the oracle
    * replays ids exactly), and [[Graph.pageRank]]'s exact integer
    * nano-rank fixpoint. Edges are distinct adjacent-token pairs in both
    * directions (TextRank's undirected window-2 graph); rank ties break
    * by word, so the top-k cut is total-ordered and engine-invariant.
    *
    * Shape at 100 TB: tokenization is embarrassingly parallel; the edge
    * build is one distinct shuffle on (src, dst) hashes; the fixpoint
    * inherits pageRank's staged-edge no-reshuffle discipline; the final
    * join is rank-rows ⋈ vocab (both word-cardinality, far below corpus
    * cardinality) and the top-k is TakeOrderedAndProject, never a full
    * sort. A hash collision merges two words into one node for BOTH
    * engines (PolyHash56 is the shared id space) — at 2^55 that is the
    * right trade for keeping the rank table float- and string-free. */
  def textRankKeywords(docs: DataFrame, textCol: String, idCol: String,
      iters: Int = 4, topK: Int = 20,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(topK >= 1, s"textRankKeywords needs topK >= 1, got $topK")
    val toks = docs.select(
      filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
        .as("__t"))
    // staged: `adj` feeds the vocab build AND the edge projection (whose
    // undirected union reads it twice more) — without truncation the
    // tokenize+explode corpus scan runs three times
    val adj = staging.stage(toks.filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__t) - 1), " +
          "i -> struct(element_at(__t, i) AS a, element_at(__t, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b")), "tr-adj")
    val vocab = staging.stage(
      adj.select(col("a").as("word")).union(adj.select(col("b"))).distinct()
        .withColumn("__h", graft.functions.PolyHash56(col("word"))),
      "tr-vocab")
    val directed = adj.select(
      graft.functions.PolyHash56(col("a")).as("src"),
      graft.functions.PolyHash56(col("b")).as("dst"))
    val und = directed.union(
      directed.select(col("dst").as("src"), col("src").as("dst")))
    val ranks = Graph.pageRank(und, "src", "dst", iters, staging = staging)
    ranks.join(vocab, ranks("node") === vocab("__h"))
      .select(col("word"), col("rank_nano"))
      .orderBy(col("rank_nano").desc, col("word"))
      .limit(topK)
  }

  /** Per-document profile frame: one narrow projection, no shuffle. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.select(
      df.columns.toIndexedSeq.map(col) :+
        tokenCount(col(textCol)).as("n_tokens") :+
        subwordTokenEstimate(col(textCol)).as("n_subwords") :+
        charCount(col(textCol)).as("n_chars_m") :+
        round(avgWordLength(col(textCol)), 4).as("avg_word_len") :+
        round(stopwordRatio(col(textCol)), 4).as("stopword_ratio") :+
        round(punctRatio(col(textCol)), 4).as("punct_ratio") :+
        qualityScore(col(textCol)).as("quality") :+
        languageIdHeuristic(col(textCol)).as("lang_guess") :+
        fingerprint(col(textCol)).as("fp"): _*
    )

  /** Heaps-law vocabulary growth curve: cumulative token count vs
    * cumulative DISTINCT vocabulary as the corpus grows in `idCol` order,
    * reported at `buckets` evenly-spaced id checkpoints (Heaps 1978,
    * V(n) ≈ K·n^β) — the curve a pre-training data team reads to decide
    * whether more of the same source still buys new vocabulary.
    *
    * The classic formulation is a SEQUENTIAL scan (vocab so far); the
    * distributed shape: a term's contribution to the curve depends only
    * on its FIRST occurrence, so one (term → min id) aggregate converts
    * the sequential set-union into per-bucket "new term" counts, and the
    * cumulative curve is a 20-row window on the bucket frame. Buckets by
    * exact integer arithmetic (id·buckets)/(maxId+1) — no float binning.
    * Two exchanges over data (term min-id, per-doc token counts → bucket
    * partials); the cumsum runs on `buckets` rows, not the corpus. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets >= 1 && buckets <= 10000, s"buckets $buckets out of range")
    val terms = docs
      .select(col(idCol).cast("long").as("__id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__term"))
      .filter(col("__term") =!= "")
    val mx = docs.agg(max(col(idCol)).cast("long").as("__mx"))
    def bucket(idc: Column) = (idc * buckets / (col("__mx") + 1) + 1).cast("int")
    // per-bucket token + doc counts
    val perBucket = docs
      .select(col(idCol).cast("long").as("__id"),
        tokenCount(col(textCol)).cast("long").as("__tk"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("__id")).as("bucket"))
      .agg(count(lit(1)).as("__docs"), sum("__tk").as("__toks"))
    // per-bucket NEW vocabulary from first occurrences
    val newTerms = terms.groupBy("__term").agg(min("__id").as("__fd"))
      .crossJoin(broadcast(mx))
      .groupBy(bucket(col("__fd")).as("bucket"))
      .agg(count(lit(1)).as("__new"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTerms, Seq("bucket"), "left")
      .withColumn("__new", coalesce(col("__new"), lit(0L)))
      // `buckets` rows from here on: the single-partition window is fine
      .select(col("bucket"),
        sum("__docs").over(w).as("docs_cum"),
        sum("__toks").over(w).as("tokens_cum"),
        sum("__new").over(w).as("vocab_cum"))
  }
}
