package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (brief: language-ID,
  * quality scoring, token counting, fingerprinting) — all built from
  * codegen'd built-ins (no UDFs) and mirrored exactly in the DuckDB oracles.
  */
object TextAnalysis {

  /** Small multilingual stopword profiles for the n-gram/stopword language
    * heuristic. Deterministic, data-independent. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  // ---- shared signal expressions (one definition; quality/langId/
  // regexTokens and the composed cleanCorpus all project the same columns) --
  private def tokens: Column = split(col("text"), " ")
  private def punctRatioCol: Column = {
    // zero-char text: the ratio's denominator is 0, which ANSI mode makes
    // a DIVIDE_BY_ZERO error (not a NULL) — pin it to 0.0 so quality is
    // TOTAL (empty doc ⇒ quality 0.01, gated out by any real threshold);
    // the SQL twin carries the same CASE (CurationProps found the raise)
    val nChar = length(col("text"))
    when(nChar === 0, lit(0.0)).otherwise(
      round((nChar - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
        .cast("double") / nChar, 4))
  }
  private def qualityCol: Column =
    round(least(size(tokens).cast("double") / 100, lit(1.0)) *
      (lit(1.0) - punctRatioCol), 4)

  /** The composite quality score as a DuckDB expression over a
    * `documents`-shaped relation — the SQL twin of qualityCol, shared by
    * the text_quality oracle (SparkEntry) and the keep-best dedup oracle
    * (Clusters.keepBestOracleSql) so the score has one SQL rendering. */
  val qualitySqlExpr: String =
    """round(least(len(string_split(text, ' ')) / 100.0, 1.0) *
      |  (1.0 - CASE WHEN len(text) = 0 THEN 0.0
      |   ELSE round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0 / len(text), 4) END), 4)"""
      .stripMargin.replaceAll("\\s+", " ")
  private def langPredCol: Column = {
    val hits = langProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(size(filter(tokens, t => t.isin(words: _*))).as("hits"),
        lit(-i).as("ord"), lit(lang).as("lang"))
    }
    when(greatest(hits: _*).getField("hits") === 0, "und")
      .otherwise(greatest(hits: _*).getField("lang"))
  }
  private def regexTokensCol: Column =
    size(regexp_extract_all(col("text"),
      lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** Quality signals: token count, mean token length, punctuation ratio,
    * stopword ratio, and a composite [0,1] score (longer docs with moderate
    * punctuation and some stopwords score higher — the usual cheap proxy
    * filters applied before expensive dedup at corpus scale). */
  def quality(docs: DataFrame): DataFrame = {
    val tok = tokens
    val nTok = size(tok)
    val nChar = length(col("text"))
    val stop = TextAnalysis.langProfiles.head._2 // en
    val nStop = size(filter(tok, t => t.isin(stop: _*)))
    val meanTokLen = round((nChar - (nTok - 1)).cast("double") / nTok, 4)
    docs.select(col("doc_id"), nTok.as("n_tokens"), meanTokLen.as("mean_tok_len"),
      punctRatioCol.as("punct_ratio"),
      round(nStop.cast("double") / nTok, 4).as("stop_ratio"),
      qualityCol.as("quality"))
  }

  /** The Gopher rule set's stop-word list (Rae et al. 2021, Appendix A):
    * a document must contain at least two of these to pass. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style RULE-BASED quality filter (Rae et al. 2021, Appendix A)
    * — the published boolean rubric corpora are gated on before the
    * continuous score above is even computed, at the published bounds:
    * word count in [50, 100000], mean word length in [3, 10],
    * symbol-to-word ratio ('#' and '...') ≤ 0.1, ≥ 80% of words contain
    * an alphabetic character, and ≥ `minStops` distinct stop-word hits
    * (published default 2; the oracle entry pins 1 because the synthetic
    * vocabulary contains only 'the' of the eight published stop words, so
    * ≥2 is false corpus-wide and the verdict column would be vacuous —
    * the dedup_embcos fixture-driven-threshold precedent, ADVICE r6).
    * (The bullet/ellipsis LINE-ratio rules are omitted — the corpus is
    * single-line; they'd be two more ratio columns of the same shape.)
    * Every signal is a per-row codegen projection (zero shuffle), and the
    * pass verdict compares the ROUNDED ratios so the boundary cases agree
    * with the DuckDB mirror bit-for-bit. */
  def gopherRules(docs: DataFrame, minStops: Int = 2): DataFrame = {
    val tok = tokens
    val nTok = size(tok)
    val nChar = length(col("text"))
    val meanWordLen = round((nChar - (nTok - 1)).cast("double") / nTok, 4)
    // '#' count + non-overlapping '...' count; literal replace on both
    // engines so occurrence semantics can't diverge
    val nSym = (nChar - length(regexp_replace(col("text"), "#", ""))) +
      (nChar - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = round(nSym.cast("double") / nTok, 4)
    val alphaRatio = round(
      size(filter(tok, t => t.rlike("[a-zA-Z]"))).cast("double") / nTok, 4)
    val stopHits = GopherStops
      .map(w => array_contains(tok, w).cast("int")).reduce(_ + _)
    docs.select(col("doc_id"), nTok.as("n_words"),
        meanWordLen.as("mean_word_len"), symbolRatio.as("symbol_ratio"),
        alphaRatio.as("alpha_ratio"), stopHits.as("stop_hits"))
      .withColumn("passes",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 && col("alpha_ratio") >= 0.8 &&
          col("stop_hits") >= minStops)
  }

  /** DuckDB mirror of gopherRules: same signals, same rounded-value
    * comparisons, verdict composed in an outer select over the aliased
    * signal columns. */
  def gopherRulesOracleSql(minStops: Int = 2): String =
    s"""SELECT *, (n_words >= 50 AND n_words <= 100000
      |  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
      |  AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
      |  AND stop_hits >= $minStops) AS passes
      |FROM (SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  round((len(text) - (len(string_split(text, ' ')) - 1)) * 1.0
      |    / len(string_split(text, ' ')), 4) AS mean_word_len,
      |  round(((len(text) - len(regexp_replace(text, '#', '', 'g'))) +
      |      (len(text) - len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3)
      |    * 1.0 / len(string_split(text, ' ')), 4) AS symbol_ratio,
      |  round(len(list_filter(string_split(text, ' '),
      |      t -> regexp_matches(t, '[a-zA-Z]'))) * 1.0
      |    / len(string_split(text, ' ')), 4) AS alpha_ratio,
      |  (CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'be') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'to') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'of') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'and') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'that') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'have') THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(string_split(text, ' '), 'with') THEN 1 ELSE 0 END
      |  ) AS stop_hits
      |  FROM documents)""".stripMargin.replaceAll("\\s+", " ")

  /** Language-ID by stopword-profile hit counting with deterministic
    * tie-break (first profile in declaration order wins ties; 'und' when no
    * profile hits). The real-corpus version swaps profiles for char-n-gram
    * tables; the operator shape — per-doc argmax over a broadcast profile
    * set — is identical. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langPredCol.as("lang_pred"))

  /** DuckDB mirror of langId, generated from the same langProfiles (the
    * SparkEntry oracle previously hand-carried a third copy of the hit
    * lists). */
  def langIdOracleSql: String =
    s"""WITH h AS (SELECT doc_id, text, $langHitsSql FROM documents)
       |SELECT doc_id, $langCaseSql AS lang_pred FROM h"""
      .stripMargin.replaceAll("\\s+", " ")

  /** CONFUSION MATRIX of the language-ID heuristic against the corpus's
    * labeled `lang` column — the classifier-quality audit run before
    * trusting a cheap lang gate at scale (which languages leak through,
    * which get over-filtered). One partial-aggregating groupBy on the
    * (|langs|+1)² key space; output is confusion-matrix-sized at any
    * corpus volume. Returns (lang, lang_pred, n). */
  def langIdConfusion(docs: DataFrame): DataFrame =
    docs.select(col("lang"), langPredCol.as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))

  def langIdConfusionOracleSql: String =
    s"""WITH h AS (SELECT lang, text, $langHitsSql FROM documents)
       |SELECT lang, $langCaseSql AS lang_pred, count(*) AS n
       |FROM h GROUP BY 1, 2""".stripMargin.replaceAll("\\s+", " ")

  /** Token counting with a BPE-ish regex (word runs vs single punctuation
    * marks) instead of whitespace split — the count a subword tokenizer's
    * pre-tokenizer would see. */
  def regexTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), regexTokensCol.as("n_regex_tokens"))

  /** The composed corpus-prep pipeline a training-data job runs end-to-end:
    * exact dedup (canonical copy = min doc_id per md5(text)), quality gate,
    * language filter, subword-ish token accounting. All signals come out of
    * ONE projection over the deduped docs — composing the per-signal
    * DataFrames with joins would re-scan the corpus once per signal (the
    * lazy-plan fan-out trap). The dedup is a groupBy on the hash plus a
    * left-semi join back — both shuffles hash-partition on bounded keys, no
    * all-pairs stage, so the chain survives 100 TB unchanged. */
  def cleanCorpus(docs: DataFrame, minQuality: Double,
      lang: String): DataFrame = {
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
    docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), langPredCol.as("lang_pred"),
        regexTokensCol.as("n_regex_tokens"), qualityCol.as("quality"))
      .filter(col("quality") >= minQuality && col("lang_pred") === lang)
  }

  /** Repetition signals (the Gopher-style intra-document repetition rules a
    * quality filter applies before training): per doc, the fraction of all
    * bigram occurrences claimed by the single most frequent bigram, and the
    * fraction of trigram occurrences that are repeats of an earlier trigram.
    * High values flag boilerplate/degenerate text. The trigram ratio is a
    * pure per-row array projection (no shuffle); the top-bigram ratio is two
    * partial-aggregating groupBys keyed on doc_id — both bounded per doc, so
    * the operator is a linear scan at any corpus size. Docs with <3 tokens
    * have no trigrams, so their dup_trigram_frac is pinned to 0.0 (the
    * unguarded sequence(0, size-3) would otherwise go descending and invent
    * degenerate trigrams). Docs with <2 tokens have no bigrams either and
    * DROP from the output on BOTH engines (the explode of the guarded
    * empty array here ≡ the oracle's empty range + inner join — review
    * finding, r19: the unguarded bigram sequence was the same descending
    * trap the trigram comment documents). */
  def repetition(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), tokens.as("tok"))
    // the guard must wrap the transform itself: on a <3-token doc the
    // unguarded sequence(0, size-3) goes descending and tok[i+2] is an
    // ANSI out-of-bounds error, not a null
    val tri = tok.select(col("doc_id"),
      expr("""CASE WHEN size(tok) >= 3
             THEN transform(sequence(0, size(tok)-3),
                  i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))
             ELSE array() END""").as("tg"))
      .select(col("doc_id"),
        when(size(col("tg")) > 0,
          round(lit(1.0) - size(array_distinct(col("tg"))).cast("double") /
            size(col("tg")), 6))
          .otherwise(lit(0.0)).as("dup_trigram_frac"))
    val big = tok.select(col("doc_id"),
        explode(expr("""CASE WHEN size(tok) >= 2
          THEN transform(sequence(0, size(tok)-2),
               i -> concat_ws(' ', tok[i], tok[i+1]))
          ELSE CAST(array() AS array<string>) END""")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max("c").cast("double") / sum("c"), 6).as("top_bigram_frac"))
    tri.join(big, Seq("doc_id"))
  }

  /** PII/URL scrubbing — the masking pass a corpus runs before release:
    * count and replace email addresses and URLs with placeholder tokens.
    * Pure per-row regexes (codegen'd, no shuffle, linear scan at any
    * volume). The synthetic corpus contains no PII, so `scrubPlanted`
    * deterministically appends an email + URL to every `every`-th doc on
    * BOTH engines (the planted-fixture pattern dedup_embcos_real uses) to
    * keep the entry non-vacuous. */
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val UrlRe = "https?://[^ ]+"

  def scrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("n_urls"),
      md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>")).as("scrubbed_md5"))

  def scrubPlanted(docs: DataFrame, every: Int): DataFrame =
    scrub(docs.withColumn("text",
      when(col("doc_id") % every === 0,
        concat(col("text"),
          lit(" reach out to sales.team+eu@example-corp.io or https://example-corp.io/contact?ref=1")))
        .otherwise(col("text"))))

  def scrubPlantedOracleSql(every: Int): String =
    s"""WITH d AS (SELECT doc_id,
       |    CASE WHEN doc_id % $every = 0 THEN text ||
       |      ' reach out to sales.team+eu@example-corp.io or https://example-corp.io/contact?ref=1'
       |    ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all(text, '$UrlRe')) AS n_urls,
       |  md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |      '$UrlRe', '<URL>', 'g')) AS scrubbed_md5
       |FROM d""".stripMargin.replaceAll("\\s+", " ")

  /** C4-style BLOCKLIST word filter — the published "bad words" pass
    * (C4 drops any page containing a listed term): the list is a BOUNDED
    * published artifact, so it folds into the projection as an array
    * literal and the verdict is a per-row arrays_overlap over the token
    * set — zero joins, zero exchanges for the verdict itself; the
    * statement is the corpus scan. Returns every doc with its verdict
    * plus the matched terms (the audit trail a removal pass logs).
    * The planted list holds real corpus words so the entry is
    * non-vacuous. */
  def blocklistFilter(docs: DataFrame, blocked: Seq[String]): DataFrame = {
    val bl = array(blocked.map(lit): _*)
    docs.select(col("doc_id"),
        split(col("text"), " ").as("tok"))
      .select(col("doc_id"),
        array_sort(array_intersect(array_distinct(col("tok")), bl))
          .as("matched"))
      .select(col("doc_id"),
        (size(col("matched")) > 0).as("blocked"),
        concat_ws(",", col("matched")).as("matched"))
  }

  /** The removal accounting — per source: docs checked, docs dropped,
    * drop ratio (what the C4 paper reports per list). */
  def blocklistReport(docs: DataFrame, blocked: Seq[String]): DataFrame = {
    val bl = array(blocked.map(lit): _*)
    docs.select(col("source"),
        arrays_overlap(split(col("text"), " "), bl).as("hit"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_blocked"))
      .select(col("source"), col("n_docs"), col("n_blocked"),
        round(col("n_blocked") / col("n_docs"), 6).as("block_ratio"))
  }

  private def blockedSqlList(blocked: Seq[String]): String =
    // SQL-escape embedded quotes: a blocklist word with an apostrophe would
    // otherwise render malformed oracle SQL
    blocked.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")

  def blocklistFilterOracleSql(blocked: Seq[String]): String =
    s"""SELECT doc_id, len(m) > 0 AS blocked,
       |  coalesce(array_to_string(m, ','), '') AS matched FROM (
       |  SELECT doc_id, list_sort(list_distinct(list_intersect(
       |    string_split(text, ' '), ${blockedSqlList(blocked)}))) AS m
       |  FROM documents)""".stripMargin.replaceAll("\\s+", " ")

  def blocklistReportOracleSql(blocked: Seq[String]): String =
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(hit) AS BIGINT) AS n_blocked,
       |  round(sum(hit) * 1.0 / count(*), 6) AS block_ratio
       |FROM (SELECT source,
       |  CASE WHEN len(list_intersect(string_split(text, ' '),
       |    ${blockedSqlList(blocked)})) > 0 THEN 1 ELSE 0 END AS hit
       |  FROM documents)
       |GROUP BY source""".stripMargin.replaceAll("\\s+", " ")

  /** Per-domain corpus stats — the signal behind domain blocklists and
    * per-domain quotas (a web corpus is curated per REGISTRAR domain, not
    * per page): extract each doc's first URL host, aggregate doc count and
    * char volume per domain. Pure regexp_extract + one partial-aggregating
    * groupBy on the (bounded) domain key — a linear scan at any corpus
    * size. The synthetic corpus has no URLs, so `domainStatsPlanted`
    * deterministically appends a doc_id-varied URL to every `every`-th doc
    * on BOTH engines (the planted-fixture pattern text_scrub uses). */
  def domainStats(docs: DataFrame): DataFrame =
    docs.select(
        regexp_extract(col("text"), "https?://([^/ ]+)", 1).as("domain"),
        col("n_chars"))
      .filter(col("domain") =!= "")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))

  def domainStatsPlanted(docs: DataFrame, every: Int): DataFrame =
    domainStats(docs.withColumn("text",
      when(col("doc_id") % every === 0,
        concat(col("text"), lit(" see https://site"),
          (col("doc_id") % 7).cast("string"), lit(".example/path?x=1")))
        .otherwise(col("text"))))

  def domainStatsPlantedOracleSql(every: Int): String =
    s"""WITH d AS (SELECT
       |    CASE WHEN doc_id % $every = 0 THEN text || ' see https://site' ||
       |      CAST(doc_id % 7 AS VARCHAR) || '.example/path?x=1'
       |    ELSE text END AS text, n_chars
       |  FROM documents),
       |x AS (SELECT regexp_extract(text, 'https?://([^/ ]+)', 1) AS domain,
       |    n_chars FROM d)
       |SELECT domain, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM x WHERE domain <> '' GROUP BY domain""".stripMargin
      .replaceAll("\\s+", " ")

  /** The shared planted-URL corpus for the URL-level curation ops (the
    * synthetic corpus has no URLs — the text_scrub planted-fixture
    * pattern): every `every`-th doc gets a URL with a CASE-VARIED host
    * (doc_id % 7 hosts), one of 3 paths, and a per-doc query string, so
    * normalization has real work to do (case folding, query stripping)
    * and every host+path group has many members to dedup/cap. */
  private def withPlantedUrls(docs: DataFrame, every: Int): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % every === 0,
        concat(col("text"), lit(" see https://Site"),
          (col("doc_id") % 7).cast("string"), lit(".example/Path"),
          (col("doc_id") % 3).cast("string"), lit("?ref="),
          col("doc_id").cast("string")))
        .otherwise(col("text")))

  private def plantedUrlCteSql(every: Int): String =
    s"""d AS (SELECT doc_id,
       |    CASE WHEN doc_id % $every = 0 THEN text || ' see https://Site' ||
       |      CAST(doc_id % 7 AS VARCHAR) || '.example/Path' ||
       |      CAST(doc_id % 3 AS VARCHAR) || '?ref=' || CAST(doc_id AS VARCHAR)
       |    ELSE text END AS text
       |  FROM documents)""".stripMargin

  /** URL-normalized dedup — the C4/RefinedWeb "one page per URL" step that
    * runs BEFORE content dedup (a recrawled page is the same document even
    * when its boilerplate drifted, and the URL key is free while MinHash
    * is not): normalize each doc's URL (lowercase, query string stripped,
    * trailing slash trimmed) and keep the lowest doc_id per normalized
    * URL. One regexp projection + one partial-aggregating groupBy on the
    * (bounded, URL-cardinality) key — a linear scan at any corpus size;
    * the min-id keep rule is the exact-dedup canonical-copy contract
    * (cleanCorpus). Returns (url_norm, keep_id, n_dups). */
  def urlDedup(docs: DataFrame, every: Int): DataFrame =
    withPlantedUrls(docs, every)
      .select(col("doc_id"),
        rtrim(lower(regexp_extract(col("text"), "https?://([^ ?]+)", 1)), "/")
          .as("url_norm"))
      .filter(col("url_norm") =!= "")
      .groupBy("url_norm")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  def urlDedupOracleSql(every: Int): String =
    s"""WITH ${plantedUrlCteSql(every)},
       |u AS (SELECT doc_id,
       |    rtrim(lower(regexp_extract(text, 'https?://([^ ?]+)', 1)), '/')
       |      AS url_norm
       |  FROM d)
       |SELECT url_norm, min(doc_id) AS keep_id, count(*) AS n_dups
       |FROM u WHERE url_norm <> '' GROUP BY url_norm""".stripMargin
      .replaceAll("\\s+", " ")

  /** Per-domain frequency cap — the anti-boilerplate quota every web
    * corpus applies after `domainStats` identifies the heavy registrars
    * (an uncapped corpus is mostly its top domains; the cap bounds any one
    * domain's influence on the model): keep at most `cap` docs per
    * normalized (lowercased) domain, drawn in the deterministic md5 order
    * every sampler here shares. Scale: the rank filter is a static bound,
    * so it rewrites to WindowGroupLimit — executors forward ≤ cap rows per
    * domain instead of sorting whole mega-domains. Returns (doc_id,
    * domain). */
  def domainCap(docs: DataFrame, every: Int, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(md5(concat(lit("cap:"), col("doc_id").cast("string"))),
        col("doc_id"))
    withPlantedUrls(docs, every)
      .select(col("doc_id"),
        lower(regexp_extract(col("text"), "https?://([^/ ?]+)", 1))
          .as("domain"))
      .filter(col("domain") =!= "")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("domain"))
  }

  def domainCapOracleSql(every: Int, cap: Int): String =
    s"""WITH ${plantedUrlCteSql(every)},
       |u AS (SELECT doc_id,
       |    lower(regexp_extract(text, 'https?://([^/ ?]+)', 1)) AS domain
       |  FROM d),
       |r AS (SELECT doc_id, domain, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY md5('cap:' || doc_id), doc_id) AS rn
       |  FROM u WHERE domain <> '')
       |SELECT doc_id, domain FROM r WHERE rn <= $cap""".stripMargin
      .replaceAll("\\s+", " ")

  /** DuckDB mirror of `repetition` over the `documents` view. */
  def repetitionOracleSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      |tri AS (SELECT doc_id, len(tok) AS n_tok,
      |  list_transform(range(1, len(tok) - 1),
      |    i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]) AS tg FROM tok),
      |tr AS (SELECT doc_id,
      |  CASE WHEN n_tok >= 3
      |    THEN round(1.0 - len(list_distinct(tg)) * 1.0 / len(tg), 6)
      |    ELSE 0.0 END AS dup_trigram_frac
      |  FROM tri),
      |bg AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])) AS bg
      |  FROM tok),
      |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
      |tb AS (SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
      |  FROM bc GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id, t.dup_trigram_frac, tb.top_bigram_frac
      |FROM tr t JOIN tb ON tb.doc_id = t.doc_id""".stripMargin
      .replaceAll("\\s+", " ")

  /** DuckDB mirror of `cleanCorpus` over the `documents` view — each stage
    * reuses the already-verified per-signal oracle expression verbatim. */
  /** The ONE SQL rendering of langPredCol's per-profile hit counts —
    * `h_<lang>` columns generated from langProfiles, shared by every
    * oracle that language-IDs (cleanCorpus, funnel) so an edit to the
    * profiles updates all SQL twins at once (review finding, r19: the
    * hardcoded cleanCorpus copy would have drifted). */
  private def langHitsSql: String = langProfiles.map { case (l, words) =>
    // same quote-escaping as blockedSqlList (ADVICE r19): a profile word
    // with an apostrophe must not render malformed oracle SQL
    s"""len(list_filter(string_split(text, ' '), t -> list_contains(
       |${words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")}, t))) AS h_$l"""
      .stripMargin
  }.mkString(", ")

  /** The tie-break CASE over the h_<lang> columns: no hits → 'und',
    * otherwise the EARLIEST profile among the max-hit ones wins — exactly
    * langPredCol's greatest-of-structs order (hits DESC, profile index
    * ASC via the -i ord field). */
  private def langCaseSql: String = {
    val names = langProfiles.map(_._1)
    val und = names.map(l => s"h_$l = 0").mkString(" AND ")
    val arms = names.zipWithIndex.dropRight(1).map { case (l, i) =>
      val geq = names.drop(i + 1).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $geq THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN $und THEN 'und' $arms ELSE '${names.last}' END"
  }

  def cleanCorpusSql(minQuality: Double, lang: String): String =
    s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |d AS (SELECT documents.* FROM documents JOIN keep USING (doc_id)),
       |h AS (SELECT doc_id, $langHitsSql,
       |  len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]')) AS n_regex_tokens,
       |  $qualitySqlExpr AS quality
       |  FROM d),
       |sig AS (SELECT doc_id, $langCaseSql AS lang_pred,
       |  n_regex_tokens, quality FROM h)
       |SELECT doc_id, lang_pred, n_regex_tokens, quality FROM sig
       |WHERE quality >= $minQuality AND lang_pred = '$lang'
       |""".stripMargin.replaceAll("\\s+", " ")

  /** The curation FUNNEL — the per-stage attrition table every published
    * pipeline reports (C4 §2.2, Gopher A.1.1, RefinedWeb tbl. 2): docs in,
    * docs dropped, docs out for each stage in pipeline order. Stage order
    * follows the published convention — cheap per-row filters first
    * (language-ID, quality, blocklist), exact dedup LAST so the expensive
    * grouped stage runs over the pre-shrunk survivor set; each doc is
    * charged to the FIRST stage that drops it. One cached scoring scan
    * feeds both the survivor dedup groupBy and the one-row conditional
    * aggregation; the output is 4 rows at any corpus size. Dedup keeps the
    * min-doc_id occurrence AMONG SURVIVORS (a duplicate whose first copy
    * was filtered earlier survives as the new first). Returns
    * (stage_idx, stage, n_in, n_dropped, n_out) ordered by stage_idx. */
  /** The shared funnel scoring pass: per doc, the three per-row keep
    * flags, the dedup hash, and the among-survivors first-occurrence
    * marker. The cached row carries md5(text), never text: the only
    * downstream text consumer is the dedup key, and pinning the raw
    * corpus in cache would spill at scale for no reason (review finding,
    * r19). Dedup firsts are GLOBAL (a text duplicated across sources is
    * kept once corpus-wide) — the by-source report attributes the drop to
    * the copy's own source. */
  private def funnelFlagged(docs: DataFrame, minQuality: Double,
      lang: String, blocked: Seq[String]): DataFrame = {
    val bl = array(blocked.map(lit): _*)
    // NULL text coalesced to '' BEFORE any scoring — and identically in
    // the oracle's d0 CTE (ADVICE r19): keep_q alone was coalesced, so a
    // NULL-text doc left keep_lang/keep_bl NULL, and the all-NULL langid
    // tie-break resolved differently across engines (struct-greatest →
    // first profile vs CASE all-arms-NULL → ELSE last profile), charging
    // the doc to different stages. '' scores langid 'und' → charged to
    // stage 1 on BOTH engines, md5('') is a real dedup key on both, and
    // quality is TOTAL on '' (the punctRatio zero-char pin scores 0.01),
    // so every keep flag is non-null — the conservation law CurationProps
    // pins (an uncoalesced NULL drops the doc from every stage count on
    // BOTH engines, so the oracle compare alone would never catch it)
    val d0 = docs.withColumn("text", coalesce(col("text"), lit("")))
    val scored = graft.util.Caches.track(d0.select(col("doc_id"),
        col("source"), md5(col("text")).as("h"),
        (langPredCol === lang).as("keep_lang"),
        coalesce(qualityCol >= minQuality, lit(false)).as("keep_q"),
        (!arrays_overlap(tokens, bl)).as("keep_bl")).cache())
    val firsts = scored
      .filter(col("keep_lang") && col("keep_q") && col("keep_bl"))
      .groupBy(col("h")).agg(min("doc_id").as("doc_id"))
    scored.join(firsts.select(col("doc_id"), lit(true).as("is_first")),
      Seq("doc_id"), "left")
  }

  /** The funnel's conditional stage-drop aggregates (first failing stage
    * wins) — shared by the corpus-wide and per-source renderings. */
  private def funnelAggs: Seq[Column] = Seq(
    count(lit(1)).as("n0"),
    sum(when(!col("keep_lang"), 1L).otherwise(0L)).as("d1"),
    sum(when(col("keep_lang") && !col("keep_q"), 1L).otherwise(0L))
      .as("d2"),
    sum(when(col("keep_lang") && col("keep_q") && !col("keep_bl"), 1L)
      .otherwise(0L)).as("d3"),
    sum(when(col("keep_lang") && col("keep_q") && col("keep_bl") &&
      col("is_first").isNull, 1L).otherwise(0L)).as("d4"))

  /** One aggregate row (n0, d1..d4) unrolled into the 4 ordered stage
    * rows (stage_idx, stage, n_in, n_dropped, n_out). */
  private def stageRowsCol: Column = {
    def row(idx: Long, name: String, nIn: Column, drop: Column) =
      struct(lit(idx).as("stage_idx"), lit(name).as("stage"),
        nIn.as("n_in"), drop.as("n_dropped"), (nIn - drop).as("n_out"))
    val in2 = col("n0") - col("d1")
    val in3 = in2 - col("d2")
    val in4 = in3 - col("d3")
    explode(array(
      row(1L, "langid", col("n0"), col("d1")),
      row(2L, "quality", in2, col("d2")),
      row(3L, "blocklist", in3, col("d3")),
      row(4L, "exact_dup", in4, col("d4"))))
  }

  def funnelReport(docs: DataFrame, minQuality: Double, lang: String,
      blocked: Seq[String]): DataFrame =
    funnelFlagged(docs, minQuality, lang, blocked)
      .agg(funnelAggs.head, funnelAggs.tail: _*)
      .select(stageRowsCol.as("s"))
      .select("s.*")

  /** The per-SOURCE funnel — the per-subset attrition table a dataset
    * card publishes (every stage count broken down by corpus source, the
    * grain at which mixing decisions are made). Same one cached scoring
    * scan; the conditional aggregation groups by source and the output is
    * |sources| × 4 rows at any corpus size. */
  def funnelBySource(docs: DataFrame, minQuality: Double, lang: String,
      blocked: Seq[String]): DataFrame =
    funnelFlagged(docs, minQuality, lang, blocked)
      .groupBy("source")
      .agg(funnelAggs.head, funnelAggs.tail: _*)
      .select(col("source"), stageRowsCol.as("s"))
      .select(col("source"), col("s.*"))

  /** DuckDB mirror of funnelReport: the stage predicates generated from
    * the SAME langProfiles/quality/blocklist definitions the Spark side
    * uses, folded to one aggregate row and unrolled by UNION ALL. */
  /** The shared oracle CTE prefix (h, f, firsts) — the SQL twin of
    * funnelFlagged, source carried for the by-source rendering. */
  private def funnelCtesSql(minQuality: Double, lang: String,
      blocked: Seq[String]): String =
    s"""d0 AS (SELECT doc_id, source, coalesce(text, '') AS text
       |  FROM documents),
       |h AS (SELECT doc_id, source, text, $langHitsSql,
       |  $qualitySqlExpr AS quality,
       |  len(list_intersect(string_split(text, ' '),
       |    ${blockedSqlList(blocked)})) AS n_bl
       |  FROM d0),
       |f AS (SELECT doc_id, source, text,
       |  (($langCaseSql) = '$lang') AS keep_lang,
       |  coalesce(quality >= $minQuality, false) AS keep_q,
       |  (n_bl = 0) AS keep_bl FROM h),
       |firsts AS (SELECT min(doc_id) AS doc_id FROM f
       |  WHERE keep_lang AND keep_q AND keep_bl GROUP BY md5(text))"""
      .stripMargin

  /** The funnel oracle's aggregate + 4-way unroll, generated ONCE and
    * parameterized on an optional leading key column — the same
    * one-rendering rule funnelCtesSql/funnelAggs/stageRowsCol apply to
    * their halves (review finding, r19: the corpus-wide and by-source
    * bodies were two hand-mirrored ~15-line copies). */
  private def funnelTailSql(keyPrefix: String, groupBy: String): String = {
    val agg =
      s"""agg AS (SELECT ${keyPrefix}count(*) AS n0,
         |  CAST(sum(CASE WHEN NOT keep_lang THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         |  CAST(sum(CASE WHEN keep_lang AND NOT keep_q THEN 1 ELSE 0 END)
         |    AS BIGINT) AS d2,
         |  CAST(sum(CASE WHEN keep_lang AND keep_q AND NOT keep_bl THEN 1
         |    ELSE 0 END) AS BIGINT) AS d3,
         |  CAST(sum(CASE WHEN keep_lang AND keep_q AND keep_bl
         |    AND fi.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d4
         |  FROM f LEFT JOIN firsts fi ON f.doc_id = fi.doc_id$groupBy)"""
        .stripMargin
    val stages = Seq((1, "langid", "n0", "d1"),
      (2, "quality", "n0 - d1", "d2"),
      (3, "blocklist", "n0 - d1 - d2", "d3"),
      (4, "exact_dup", "n0 - d1 - d2 - d3", "d4"))
    val selects = stages.map { case (i, name, nIn, d) =>
      val alias = if (i == 1) true else false
      val cols = Seq(
        s"${keyPrefix}CAST($i AS BIGINT)" +
          (if (alias) " AS stage_idx" else ""),
        s"'$name'" + (if (alias) " AS stage" else ""),
        nIn + (if (alias) " AS n_in" else ""),
        d + (if (alias) " AS n_dropped" else ""),
        s"$nIn - $d" + (if (alias) " AS n_out" else "")).mkString(", ")
      s"SELECT $cols FROM agg"
    }.mkString(" UNION ALL ")
    s"$agg $selects"
  }

  def funnelOracleSql(minQuality: Double, lang: String,
      blocked: Seq[String]): String =
    s"""WITH ${funnelCtesSql(minQuality, lang, blocked)},
       |${funnelTailSql("", "")}""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of funnelBySource: the same CTEs and unroll with the
    * aggregate grouped by source and source carried through. */
  def funnelBySourceOracleSql(minQuality: Double, lang: String,
      blocked: Seq[String]): String =
    s"""WITH ${funnelCtesSql(minQuality, lang, blocked)},
       |${funnelTailSql("source, ", " GROUP BY source")}""".stripMargin
      .replaceAll("\\s+", " ")
}
