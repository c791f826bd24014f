package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich et al.,
  * ACL 2016 — the published subword algorithm every modern LM tokenizer
  * descends from): start from characters plus an end-of-word marker, then
  * repeatedly merge the most frequent adjacent token pair, weighted by
  * word frequency. This is the tokenizer-fit step of a training-data
  * pipeline — the op that turns a curated corpus into a vocabulary.
  *
  * Distribution shape: BPE state lives on the DISTINCT-WORD table (word,
  * n, toks) — vocabulary-sized, not corpus-sized — so each merge round is
  * one partial-aggregating groupBy over the exploded adjacent pairs of
  * that (already reduced) table plus a TakeOrdered(1) for the argmax.
  * The corpus is scanned ONCE (the word-count fold); 100 TB of text
  * becomes a few GB of weighted vocabulary before any iteration starts —
  * exactly how the published trainers scale. The driver loop collects one
  * row per round (the chosen pair) because round i+1's plan depends on
  * it; that is store-build work (Catalog.bpeMerges), never a serving
  * statement.
  *
  * Engine-exactness: merge application is a LEFT FOLD over the token
  * sequence (if the accumulator's last token is `pa` and the next token
  * is `pb`, fuse them), which reproduces the reference implementation's
  * leftmost-nonoverlapping scan — 'aaa' under merge (a,a) gives (aa, a).
  * Both engines run the identical fold (Spark `aggregate`, DuckDB
  * `list_reduce` — string accumulator with a \\u0001 separator), counts
  * are integers, and the argmax tie-break (count DESC, pa ASC, pb ASC —
  * binary string compare on both engines) is total, so the learned merge
  * table is bit-identical. */
object Bpe {

  /** Token separator inside the folded state string; asserted absent from
    * the corpus at store build. */
  val Sep = "\u0001"
  /** Pair separator for the (pa, pb) aggregation key. */
  val PairSep = "\u0002"
  /** End-of-word marker token (Sennrich et al. §3.1). */
  val EndMark = "</w>"
  /** Merge rounds learned at store build. */
  val Rounds = 8

  /** Corpus → weighted vocabulary: (word, n). The one corpus-sized scan. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Initial BPE state over the weighted vocabulary: characters plus the
    * end-of-word marker, joined by Sep. Characters come from an explicit
    * substring transform (Spark's regex split("", -1) appends a trailing
    * empty string; this does not). */
  def initState(words: DataFrame): DataFrame =
    words.select(col("word"), col("n"), initTokExpr(col("word")).as("toks"))

  /** The most frequent adjacent pair of `state`, weighted by word count:
    * one row (pa, pb, pair_n), tie-broken (pair_n DESC, pa, pb). */
  def topPair(state: DataFrame): DataFrame =
    state.select(col("n"), split(col("toks"), Sep).as("t"))
      // the guard wraps the transform itself: on a fully-merged
      // single-token word the unguarded sequence(1, size-1) goes
      // DESCENDING and element_at walks off the array (the repetition()
      // trap)
      .select(col("n"), explode(expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS pa, element_at(t, i + 1) AS pb)) " +
          "ELSE CAST(array() AS array<struct<pa:string,pb:string>>) END"))
        .as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum("n").as("pair_n"))
      .orderBy(desc("pair_n"), asc("pa"), asc("pb"))
      .limit(1)

  /** The merge-application fold on a Sep-joined token string: leftmost
    * non-overlapping fusion of adjacent (pa, pb) into pa+pb.
    *
    * The input column is referenced EXACTLY ONCE (empty-array init; the
    * first element is handled inside the lambda): encode chains M of
    * these, and a fold that used its input k times would copy the whole
    * upstream expression subtree k times per round — k^M nodes by round
    * M, which froze analysis at M = 8 in the first cut. With factor 1 the
    * chained expression grows linearly. */
  def foldMerge(toks: Column, pa: String, pb: String): Column =
    array_join(
      aggregate(
        split(toks, Sep),
        typedLit(Seq.empty[String]),
        (acc, x) =>
          when(size(acc) === 0, array(x))
            .when(element_at(acc, -1) === pa && x === pb,
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(pa + pb))))
            .otherwise(concat(acc, array(x)))),
      Sep)

  def applyMerge(state: DataFrame, pa: String, pb: String): DataFrame =
    state.select(col("word"), col("n"),
      foldMerge(col("toks"), pa, pb).as("toks"))

  /** Train `rounds` merges: the store-build driver loop (one collect per
    * round — the argmax is data the next round's plan needs). Each round's
    * state is vocabulary-sized; caching it keeps round i+1 from re-running
    * rounds 1..i's folds (and the cache is dropped as soon as the next
    * state materializes). Fails loudly if the corpus contains the state
    * separators. */
  def train(docs: DataFrame, rounds: Int = Rounds): Seq[(Int, String, String, Long)] = {
    val wc = wordCounts(docs)
    var state = initState(wc).cache()
    require(state.filter(col("word").contains(Sep) ||
        col("word").contains(PairSep)).isEmpty,
      "corpus words must not contain the BPE state separators \\u0001/\\u0002")
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = topPair(state).collect()
      // fail loudly, not with an opaque index error: a corpus whose every
      // word is fully merged before `rounds` cannot satisfy the fixed
      // round contract the oracle mirrors (its round-r CTE would go empty
      // and zero the state)
      require(top.nonEmpty,
        s"BPE merges exhausted at round $r of $rounds — corpus too small " +
          "for the configured round count")
      val row = top(0)
      val (pa, pb, pn) = (row.getString(0), row.getString(1), row.getLong(2))
      merges += ((r, pa, pb, pn))
      val next = applyMerge(state, pa, pb).cache()
      next.count() // materialize before dropping the parent cache
      state.unpersist()
      state = next
    }
    state.unpersist()
    merges.result()
  }

  /** Encode the distinct vocabulary with a LEARNED merge list (the stored
    * Catalog.bpeMerges rows, collected once — M driver-known constants):
    * the chained per-row folds, zero joins, zero exchanges. Returns
    * (word, enc, n_sub) with enc space-joined (words are space-split, so
    * a space never occurs inside a token). */
  def encodeVocab(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = merges.foldLeft(initTokExpr(col("word"))) {
      case (c, (pa, pb)) => foldMerge(c, pa, pb)
    }
    wordCounts(docs).select(col("word"), toks.as("tk"))
      .select(col("word"),
        regexp_replace(col("tk"), Sep, " ").as("enc"),
        size(split(col("tk"), Sep)).cast("long").as("n_sub"))
  }

  /** Characters-plus-EndMark init as a pure Column expression — built with
    * the Column API (not an expr string) so it also resolves when `word`
    * is a higher-order-function lambda variable, as in bpeLenExpr. */
  private def initTokExpr(word: Column): Column =
    concat_ws(Sep,
      concat(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
        array(lit(EndMark))))

  /** Per-document BPE token accounting under the learned merges — the
    * "how many tokens is this corpus" figure a data recipe is budgeted
    * in. PURE PER-ROW compute: each word occurrence runs the fold chain
    * in-plan (the quality_linear zero-shuffle posture — no vocabulary
    * join, no exchange; the statement IS the corpus scan). Returns
    * (doc_id, n_tok_bpe). */
  def docTokens(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"), bpeLenExpr(col("text"), merges))

  /** The per-row (text → total BPE token count) column — shared by the
    * batch accounting entry and the streamed ingest twin. */
  def bpeLenExpr(text: Column, merges: Seq[(String, String)]): Column = {
    val perWord = (w: Column) => {
      val enc = merges.foldLeft(initTokExpr(w)) {
        case (c, (pa, pb)) => foldMerge(c, pa, pb)
      }
      size(split(enc, Sep)).cast("long")
    }
    aggregate(
      filter(split(text, " "), w => w =!= ""),
      lit(0L),
      (acc, w) => acc + perWord(w)).as("n_tok_bpe")
  }

  /** Tokenizer FERTILITY per source — BPE tokens per whitespace word, the
    * figure tokenizer evaluations report per language/domain (Rust et al.,
    * ACL 2021 "How Good is Your Tokenizer?"): fertility near 1 means the
    * learned vocabulary fits the domain; high fertility means
    * over-segmentation (and a silently larger token budget for that
    * source). Rides the same ZERO-EXCHANGE per-row fold as docTokens —
    * the merges are driver constants, words count through the identical
    * non-empty filter the fold uses — plus one partial-aggregating
    * groupBy on the bounded source key. */
  def fertility(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("source"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("n_words"),
        bpeLenExpr(col("text"), merges))
      .groupBy("source")
      .agg(sum("n_words").as("n_words"), sum("n_tok_bpe").as("n_bpe"))
      // a source whose documents contain NO non-empty words has no
      // fertility (0/0): drop it, matching the oracle's inner join
      // against the encoded vocabulary, which never emits such a source
      // (ADVICE r18: Spark emitted (source, 0, 0, null) there)
      .filter(col("n_words") > 0)
      .select(col("source"), col("n_words"), col("n_bpe"),
        round(col("n_bpe") / col("n_words"), 4).as("fertility"))

  /** DuckDB mirror of fertility: the inner join against the encoded
    * vocabulary drops empty words exactly like the fold's filter, so
    * count(*) IS the non-empty word count. */
  def fertilityOracleSql(rounds: Int = Rounds): String =
    s"""WITH ${roundCtes(rounds)},
       |ws AS (SELECT word, len(string_split(toks, chr(1))) AS n_sub
       |  FROM s$rounds)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_bpe,
       |  round(CAST(sum(n_sub) AS BIGINT) * 1.0 / count(*), 4) AS fertility
       |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
       |  FROM documents) d
       |JOIN ws USING (word)
       |GROUP BY source""".stripMargin.replaceAll("\\s+", " ")

  /** The final VOCABULARY under the learned merges — each surviving token
    * with its corpus frequency (occurrences weighted by word count): the
    * artifact a tokenizer release ships beside the merge table. One fold
    * per distinct word, one explode, one partial-aggregating groupBy on
    * the (bounded) token key. Returns (token, freq). */
  def vocab(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = merges.foldLeft(initTokExpr(col("word"))) {
      case (c, (pa, pb)) => foldMerge(c, pa, pb)
    }
    wordCounts(docs).select(col("n"), toks.as("tk"))
      .select(col("n"), explode(split(col("tk"), Sep)).as("token"))
      .groupBy("token").agg(sum("n").as("freq"))
  }

  def vocabOracleSql(rounds: Int = Rounds): String =
    s"""WITH ${roundCtes(rounds)}
       |SELECT token, CAST(sum(n) AS BIGINT) AS freq FROM (
       |  SELECT n, unnest(string_split(toks, chr(1))) AS token FROM s$rounds)
       |GROUP BY token""".stripMargin.replaceAll("\\s+", " ")

  // ---- DuckDB mirrors ------------------------------------------------------

  /** Shared SQL fragments: s0 is the initial state over the weighted
    * vocabulary; each round r adds pair counts pR, the argmax mR, and the
    * folded state sR. */
  private def roundCtes(rounds: Int): String = {
    val per = (1 to rounds).map { r =>
      s"""p$r AS (SELECT pair, CAST(sum(n) AS BIGINT) AS pn FROM (
         |  SELECT n, unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || chr(2) || t[i+1])) AS pair
         |  FROM (SELECT n, string_split(toks, chr(1)) AS t FROM s${r - 1}))
         |  GROUP BY pair),
         |m$r AS (SELECT split_part(pair, chr(2), 1) AS pa,
         |    split_part(pair, chr(2), 2) AS pb, pn
         |  FROM p$r ORDER BY pn DESC, pa, pb LIMIT 1),
         |s$r AS (SELECT word, n, list_reduce(string_split(toks, chr(1)),
         |    (acc, x) -> CASE
         |      WHEN x = m.pb AND (acc = m.pa OR ends_with(acc, chr(1) || m.pa))
         |      THEN left(acc, len(acc) - len(m.pa)) || m.pa || m.pb
         |      ELSE acc || chr(1) || x END) AS toks
         |  FROM s${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (SELECT word, count(*) AS n FROM (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |s0 AS (SELECT word, n,
       |  array_to_string(list_append(string_split(word, ''), '</w>'), chr(1)) AS toks
       |  FROM wc),
       |$per""".stripMargin
  }

  /** The learned merge table (round, pa, pb, pair_n). */
  def trainOracleSql(rounds: Int = Rounds): String = {
    val sel = (1 to rounds)
      .map(r => s"SELECT $r AS round, pa, pb, pn AS pair_n FROM m$r")
      .mkString(" UNION ALL ")
    s"WITH ${roundCtes(rounds)} $sel".replaceAll("\\s+", " ")
  }

  /** The encoded vocabulary (word, enc, n_sub) under the learned merges. */
  def encodeOracleSql(rounds: Int = Rounds): String =
    s"""WITH ${roundCtes(rounds)}
       |SELECT word, replace(toks, chr(1), ' ') AS enc,
       |  len(string_split(toks, chr(1))) AS n_sub
       |FROM s$rounds""".stripMargin.replaceAll("\\s+", " ")

  /** Per-document BPE token counts (doc_id, n_tok_bpe). The oracle joins
    * the encoded vocabulary back to the exploded corpus — semantics, not
    * plan shape, is what it mirrors. LEFT join from documents so a doc
    * with NO non-empty words emits (doc_id, 0) exactly like the fold's
    * empty aggregate — the vocabulary excludes '', so an inner join
    * would drop the doc entirely (review finding, r19: the fertility
    * asymmetry's per-doc sibling). */
  def docTokensOracleSql(rounds: Int = Rounds): String =
    s"""WITH ${roundCtes(rounds)},
       |ws AS (SELECT word, len(string_split(toks, chr(1))) AS n_sub
       |  FROM s$rounds),
       |dw AS (SELECT doc_id, n_sub FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents) d
       |JOIN ws USING (word))
       |SELECT doc_id, CAST(COALESCE(sum(n_sub), 0) AS BIGINT) AS n_tok_bpe
       |FROM documents LEFT JOIN dw USING (doc_id)
       |GROUP BY doc_id""".stripMargin.replaceAll("\\s+", " ")

  /** Plain-Scala reference BPE (the Sennrich pseudocode, Map-based) for
    * the spec's equality pin. */
  def referenceTrain(wordCounts: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var state: Map[Vector[String], Long] = wordCounts.map { case (w, n) =>
      (w.map(_.toString).toVector :+ EndMark) -> n
    }
    (1 to rounds).map { r =>
      val pairs = state.toSeq.flatMap { case (toks, n) =>
        toks.sliding(2).collect { case Vector(a, b) => (a, b) -> n }.toSeq
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((pa, pb), pn) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
      state = state.toSeq.map { case (toks, n) =>
        val merged = toks.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == pa && x == pb)
            acc.init :+ (pa + pb)
          else acc :+ x
        }
        merged -> n
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (r, pa, pb, pn)
    }
  }
}
