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

  /** Quality signals: token count, mean token length, punctuation ratio,
    * stopword ratio, and a composite [0,1] score (longer docs with moderate
    * punctuation and some stopwords score higher — the usual cheap proxy
    * filters applied before expensive dedup at corpus scale). */
  def quality(docs: DataFrame): DataFrame = {
    val tok = split(col("text"), " ")
    val nTok = size(tok)
    val nChar = length(col("text"))
    val punct = nChar - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))
    val stop = TextAnalysis.langProfiles.head._2 // en
    val nStop = size(filter(tok, t => t.isin(stop: _*)))
    val meanTokLen = round((nChar - (nTok - 1)).cast("double") / nTok, 4)
    val punctRatio = round(punct.cast("double") / nChar, 4)
    val stopRatio = round(nStop.cast("double") / nTok, 4)
    docs.select(col("doc_id"), nTok.as("n_tokens"), meanTokLen.as("mean_tok_len"),
      punctRatio.as("punct_ratio"), stopRatio.as("stop_ratio"),
      round(least(nTok.cast("double") / 100, lit(1.0)) * (lit(1.0) - punctRatio), 4)
        .as("quality"))
  }

  /** Language-ID by stopword-profile hit counting with deterministic
    * tie-break (first profile in declaration order wins ties; 'und' when no
    * profile hits). The real-corpus version swaps profiles for char-n-gram
    * tables; the operator shape — per-doc argmax over a broadcast profile
    * set — is identical. */
  def langId(docs: DataFrame): DataFrame = {
    val tok = split(col("text"), " ")
    val hits = langProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(size(filter(tok, t => t.isin(words: _*))).as("hits"),
        lit(-i).as("ord"), lit(lang).as("lang"))
    }
    docs.select(col("doc_id"),
      when(greatest(hits: _*).getField("hits") === 0, "und")
        .otherwise(greatest(hits: _*).getField("lang")).as("lang_pred"))
  }

  /** Token counting with a BPE-ish regex (word runs vs single punctuation
    * marks) instead of whitespace split — the count a subword tokenizer's
    * pre-tokenizer would see. */
  def regexTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        .as("n_regex_tokens"))
}
