package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ast.Query
import graft.compiler.QueryCompiler
import graft.functions.Keywords
import graft.model.Tables
import graft.operators.PostingAlgebra._

/** CORRELATE QUERY a, b — finds index features more predictive of set A than
  * set B (/root/reference/src/correlate.cc:464-576).
  *
  * Pipeline (reference semantics):
  *  1. A = eval(a) with use_max=false; B = eval(b) − A (correlate.cc:497-501).
  *  2. prior_logit = log((|A|+1)/(|B|+1)); support limits
  *     limit_X = max(|X|/20, 1) (correlate.cc:512-518).
  *  3. Keys whose raw posting count < min(limit_A, limit_B) are skipped
  *     (correlate.cc:541-542).
  *  4. All-zero-score keys are boolean features → one full-range score
  *     (correlate.cc:210-226); continuous keys run a split-point search over
  *     matched (score, class) pairs, then re-score the chosen range(s)
  *     (correlate.cc:228-358).
  *  5. A range emits when match_count_A ≥ limit_A OR match_count_B ≥ limit_B
  *     and |log_odds| ≥ log(.55/.45), where log_odds =
  *     log((cntA+1)/(cntAorB−cntA+1)) − prior (correlate.cc:135-148).
  *
  * Scale: counting is join + partial aggregation (shuffle on `off` then on
  * `key`); the split search groups matched pairs by key — the same per-key
  * parallelism as the reference's thread pool, distributed. Skewed hot keys
  * are bounded by the matched-pair count (≤ |A|+|B|), not the raw index.
  */
object CorrelateExec {

  /** Distinct membership sets: A, and B with A's offsets removed — the
    * disjointness + distinctness contract `membership` relies on.
    * UNCACHED since r16: the consumer layers' repeated set subplans are
    * identical leaf lookups over the re-laid key-pruned index, and
    * exchange reuse covers them — the r9-era caches that once saved
    * re-derivation now only forced extra materialization waves
    * (correlate_counts 11 → 3 jobs in the sf0.1 statement audit;
    * 11 → 7 in the committed sf0.01 verify map, which includes the
    * result write). */
  def sets(spark: SparkSession, t: Tables, a: Query, b: Query): (DataFrame, DataFrame) = {
    val c = new QueryCompiler(spark, t)
    val pa = dedupMin(c.compile(a).postings)
    val pb = subtract(dedupMin(c.compile(b).postings), pa)
    (pa.select("off"), pb.select("off"))
  }

  /** The tagged MEMBERSHIP union: one row per offset of A ∪ B carrying 0/1
    * flags. PRECONDITION (the `sets` contract): A and B are DISJOINT
    * (B subtracts A, correlate.cc:497-501) and internally distinct
    * (dedupMin) — that is what lets the union skip the aggregation; a
    * caller passing overlapping or duplicated sets would double-count
    * silently, so every consumer below must take its sets from `sets`
    * or reproduce that contract. Every CORRELATE layer joins THIS one
    * frame instead of each set separately — halving the membership
    * exchanges and broadcast builds per statement (r16 job audit) — and
    * the sizes frame becomes one aggregate over it. Private: the
    * disjointness invariant is not enforceable at this boundary. */
  private[exec] def membership(setA: DataFrame, setB: DataFrame): DataFrame =
    setA.select(col("off"), lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(setB.select(col("off"), lit(0).as("in_a"),
        lit(1).as("in_b")))

  /** A9 counting layer: per index key, the number of distinct key-offsets
    * matching A, B, and either (correlate.cc:84-135 — duplicate key offsets
    * counted once). Declarative: no driver-side action. `keyOff`: the
    * materialized (key, off, dup_n) occurrence store
    * (Catalog.indexKeyOff) — the query-independent grouping shuffled once
    * per sf-dir; None derives it from the raw index (ad-hoc Tables). */
  def counts(t: Tables, setA: DataFrame, setB: DataFrame,
      keyOff: Option[DataFrame] = None): DataFrame = {
    val k = keyOff.map(_.select("key", "off"))
      .getOrElse(t.index.select("key", "off").distinct())
    // the membership union is QUERY-RESULT-sized — no broadcast hint (it
    // would cap the engine at queries whose result fits on the driver);
    // AQE runtime-broadcasts it when small, shuffle-joins on `off` when
    // not. Per-row coalesce keeps all-unmatched keys at 0, the count()
    // semantics of the former two-join shape.
    k.join(membership(setA, setB), Seq("off"), "left_outer")
      .groupBy("key")
      .agg(
        sum(coalesce(col("in_a"), lit(0))).as("cnt_a"),
        sum(coalesce(col("in_b"), lit(0))).as("cnt_b"),
        count(col("in_a")).as("cnt_a_or_b"))
  }

  /** The 1-row sizes/limits/prior frame (correlate.cc:512-518) every
    * CORRELATE layer consumes as a broadcast crossJoin instead of a
    * driver-side collect: |A|, |B|, the support limits, and the prior
    * logit. Keeping the scalars AS A FRAME is what makes the whole
    * statement one lazy plan — one job wave at action time, no up-front
    * count jobs (VERDICT r13 #3: the former eager union-count collect cost
    * an extra driver-scheduled wave that inflated 5-20× under load). */
  def sizesOf(mem: DataFrame): DataFrame =
    mem.agg(sum(coalesce(col("in_a"), lit(0))).as("n_a0"),
        sum(coalesce(col("in_b"), lit(0))).as("n_b0"))
      // empty membership → NULL sums; the former count() shape gave 0
      .select(coalesce(col("n_a0"), lit(0L)).as("n_a"),
        coalesce(col("n_b0"), lit(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        greatest(floor(col("n_a") / 20), lit(1L)).as("limit_a"),
        greatest(floor(col("n_b") / 20), lit(1L)).as("limit_b"),
        log((col("n_a") + 1.0) / (col("n_b") + 1.0)).as("prior"))

  /** A11 scoring layer over full-range counts: support gates + log-odds +
    * significance cutoff, with |A|/|B|/limits as broadcast 1-row aggregates so
    * the whole statement stays one lazy plan. Key-size skip (step 3) included.
    * Returns (key, log_odds, cnt_a, cnt_b). */
  def logOdds(t: Tables, setA: DataFrame, setB: DataFrame,
      keyOff: Option[DataFrame] = None): DataFrame = {
    // the union stays LAZY although three consumers re-evaluate it (both
    // sizes aggregates + the occurrence join): measured at sf0.1, caching
    // it halves the job count (12 → 6) but costs ~30% wall time — the
    // blocking materialization wave loses more than the repeated
    // key-pruned leaf lookups cost. Revisit if a driver run shows this
    // entry wave-amplifying.
    val mem = membership(setA, setB)
    val sizes = sizesOf(mem)
    // ONE pass over the index: groupBy (key, off) carries the duplicate
    // count, so the raw key size (support gate) and the distinct-offset
    // match counts come out of the same shuffle — no second full scan;
    // with the materialized occurrence store (Catalog.indexKeyOff) even
    // that shuffle is pre-paid at store build and the statement's only
    // corpus-shaped exchange is the key aggregation below.
    val kc = keyOff.getOrElse(
      t.index.groupBy("key", "off").agg(count(lit(1)).as("dup_n")))
    kc.join(mem, Seq("off"), "left_outer")
      .groupBy("key")
      .agg(
        sum("dup_n").as("key_n"),
        sum(coalesce(col("in_a"), lit(0))).as("cnt_a"),
        sum(coalesce(col("in_b"), lit(0))).as("cnt_b"),
        count(col("in_a")).as("cnt_a_or_b"))
      .crossJoin(broadcast(sizes))
      .filter(col("key_n") >= least(col("limit_a"), col("limit_b")))
      .filter(col("cnt_a") >= col("limit_a") || col("cnt_b") >= col("limit_b"))
      .withColumn("log_odds",
        log((col("cnt_a") + 1.0) / (col("cnt_a_or_b") - col("cnt_a") + 1.0))
          - col("prior"))
      .filter(abs(col("log_odds")) >= lit(math.log(0.55 / 0.45)))
      // rounded: Java's and DuckDB's ln may differ by an ulp on the same
      // input, which an exact hash compare would flag
      .select(col("key"), round(col("log_odds"), 6).as("log_odds"),
        col("cnt_a"), col("cnt_b"))
  }

  /** DuckDB mirror of the COMPLETE pipeline (run) for leaf-query A/B — the
    * split search re-expressed with window functions: cumulative counts per
    * distinct score, candidate |logit| for the (−inf, mid] and (mid, ∞)
    * ranges, first-encountered argmax (row_number tie-break = the
    * reference's strict-> scan order), then per-range re-scoring. The logit
    * uses the identical double op sequence as splitSearch so comparisons
    * agree bit-for-bit. */
  def fullOracleSql(idxCte: String, aKey: String, bKey: String): String =
    s"""$idxCte,
       |a AS (SELECT DISTINCT off FROM idx WHERE key = '$aKey'),
       |b AS (SELECT DISTINCT off FROM idx WHERE key = '$bKey'
       |      AND off NOT IN (SELECT off FROM a)),
       |lims AS (SELECT na, nb, greatest(na // 20, 1) AS lim_a,
       |           greatest(nb // 20, 1) AS lim_b,
       |           ln((na + 1.0) / (nb + 1.0)) AS prior
       |         FROM (SELECT (SELECT count(*) FROM a) AS na,
       |                      (SELECT count(*) FROM b) AS nb)),
       |km AS (SELECT key, count(*) AS key_n,
       |         max(CASE WHEN score <> 0 THEN 1 ELSE 0 END) AS cont
       |       FROM idx GROUP BY key),
       |keys_ok AS (SELECT key, cont FROM km, lims WHERE key_n >= least(lim_a, lim_b)),
       |cls AS (SELECT i.key, i.score,
       |          (CASE WHEN a.off IS NOT NULL THEN 1 ELSE 0 END
       |           - CASE WHEN b.off IS NOT NULL THEN 1 ELSE 0 END) AS cls
       |        FROM idx i JOIN keys_ok k ON i.key = k.key AND k.cont = 1
       |        LEFT JOIN a ON a.off = i.off LEFT JOIN b ON b.off = i.off
       |        WHERE a.off IS NOT NULL OR b.off IS NOT NULL),
       |csize AS (SELECT key, count(*) AS n FROM cls GROUP BY key),
       |agg AS (SELECT key, score,
       |          sum(ca_s) OVER w AS ca, sum(cb_s) OVER w AS cb, sum(cab_s) OVER w AS cab,
       |          row_number() OVER (PARTITION BY key ORDER BY score) AS ridx,
       |          count(*) OVER (PARTITION BY key) AS nagg,
       |          lead(score) OVER (PARTITION BY key ORDER BY score) AS next_score
       |        FROM (SELECT key, score,
       |                sum(CASE WHEN cls >= 0 THEN 1 ELSE 0 END) AS ca_s,
       |                sum(CASE WHEN cls <= 0 THEN 1 ELSE 0 END) AS cb_s,
       |                count(*) AS cab_s
       |              FROM cls GROUP BY key, score)
       |        WINDOW w AS (PARTITION BY key ORDER BY score
       |                     ROWS UNBOUNDED PRECEDING)),
       |tot AS (SELECT key, max(ca) AS ta, max(cb) AS tb, max(cab) AS tab
       |        FROM agg GROUP BY key),
       |cand AS (
       |  SELECT g.key, g.ridx, g.nagg, g.score AS mid, g.next_score, 0 AS is_upper,
       |    abs(ln(((g.ca + 1.0) / (g.cab + 2.0)) / (1.0 - (g.ca + 1.0) / (g.cab + 2.0))) - l.prior) AS al
       |  FROM agg g, lims l WHERE g.ca >= l.lim_a OR g.cb >= l.lim_b
       |  UNION ALL
       |  SELECT g.key, g.ridx, g.nagg, g.score, g.next_score, 1,
       |    abs(ln((((t.ta - g.ca) + 1.0) / ((t.tab - g.cab) + 2.0)) /
       |        (1.0 - ((t.ta - g.ca) + 1.0) / ((t.tab - g.cab) + 2.0))) - l.prior)
       |  FROM agg g JOIN tot t ON t.key = g.key, lims l
       |  WHERE (t.ta - g.ca) >= l.lim_a OR (t.tb - g.cb) >= l.lim_b),
       |chosen AS (SELECT key, ridx, nagg, mid, next_score, al FROM (
       |    SELECT *, row_number() OVER (PARTITION BY key
       |      ORDER BY al DESC, ridx ASC, is_upper ASC) AS rn FROM cand)
       |  WHERE rn = 1),
       |cont_keys AS (SELECT k.key FROM keys_ok k JOIN csize c ON c.key = k.key, lims l
       |              WHERE k.cont = 1 AND c.n >= least(l.lim_a, l.lim_b)),
       |split AS (SELECT * FROM chosen
       |          WHERE ridx > 1 AND ridx < nagg AND al >= ln(1.05)),
       |ranges AS (
       |  SELECT key, CAST(NULL AS DOUBLE) AS lo, mid AS hi FROM split
       |  UNION ALL
       |  SELECT key, next_score, CAST(NULL AS DOUBLE) FROM split
       |  UNION ALL
       |  SELECT key, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM cont_keys
       |    WHERE key NOT IN (SELECT key FROM split)
       |  UNION ALL
       |  SELECT key, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM keys_ok
       |    WHERE cont = 0),
       |inr AS (SELECT DISTINCT r.key, r.lo, r.hi, i.off
       |        FROM ranges r JOIN idx i ON i.key = r.key
       |        WHERE (r.lo IS NULL OR i.score >= r.lo)
       |          AND (r.hi IS NULL OR i.score <= r.hi)),
       |fin AS (SELECT inr.key, inr.lo, inr.hi,
       |          count(a.off) AS cnt_a, count(b.off) AS cnt_b,
       |          count(CASE WHEN a.off IS NOT NULL OR b.off IS NOT NULL THEN 1 END) AS cab
       |        FROM inr LEFT JOIN a ON a.off = inr.off LEFT JOIN b ON b.off = inr.off
       |        GROUP BY inr.key, inr.lo, inr.hi)
       |SELECT key, lo AS min_score, hi AS max_score,
       |  round(ln((cnt_a + 1.0) / (cab - cnt_a + 1.0)) - prior, 6) AS log_odds, cnt_a, cnt_b
       |FROM fin, lims
       |WHERE (cnt_a >= lim_a OR cnt_b >= lim_b)
       |  AND abs(ln((cnt_a + 1.0) / (cab - cnt_a + 1.0)) - prior) >= ln(0.55 / 0.45)
       |""".stripMargin.replaceAll("\\s+", " ")

  /** The primary keyword of a query — its leftmost leaf identifier
    * (correlate.cc:464-476); drives the time-leakage filter below. */
  def primaryKeyword(q: Query): Option[String] = q match {
    case graft.ast.Leaf(id) => Some(id)
    case graft.ast.DocKey(_) => None
    case graft.ast.Bin(_, l, r) => primaryKeyword(l).orElse(primaryKeyword(r))
    case graft.ast.CmpScalar(_, l, _) => primaryKeyword(l)
    case graft.ast.CmpQuery(_, l, r) => primaryKeyword(l).orElse(primaryKeyword(r))
    case graft.ast.InRange(l, _, _) => primaryKeyword(l)
    case graft.ast.Sample(l, _) => primaryKeyword(l)
    case graft.ast.Un(_, l) => primaryKeyword(l)
  }

  /** Time-leakage filter, two-set variant (correlate.cc:401-462): keep a key
    * posting only when its date-score is strictly BEFORE the offset's
    * earliest event date (A's date when the offset is in A, else B's), and
    * rescale the score to days-before-event; postings at offsets in neither
    * set are dropped. This discards information that was unavailable at
    * event time (SURVEY §2.9). */
  def leakageFilter(keys: DataFrame, aPost: DataFrame, bPost: DataFrame): DataFrame = {
    // ONE aggregation over the tagged union instead of two separate
    // groupBy("off") subplans, and ONE left join instead of two: per
    // offset, amin/bmin fall out of the same shuffle as conditional mins —
    // identical nulls (an offset absent from a side has no isa rows, so
    // its conditional min is NULL, exactly the former left-join miss).
    // Halves the exchanges/joins of the entry (VERDICT r13 #5:
    // correlate_leakage's driver swing — fewer stages, fewer waves).
    val mins = aPost.select(col("off"), col("score"), lit(1).as("isa"))
      .unionByName(bPost.select(col("off"), col("score"), lit(0).as("isa")))
      .groupBy("off").agg(
        min(when(col("isa") === 1, col("score"))).as("amin"),
        min(when(col("isa") === 0, col("score"))).as("bmin"))
    keys.join(mins, Seq("off"), "left_outer")
      .withColumn("evt", coalesce(col("amin"), col("bmin")))
      .filter(col("evt").isNotNull && col("score") < col("evt"))
      .select(col("key"), col("off"), (col("evt") - col("score")).as("score"))
  }

  /** One-set variant (correlate.cc:360-399): offsets outside the event set
    * are KEPT, rescaled against `now` (the reference's time(nullptr)/86400 —
    * a parameter here so the engine stays deterministic). */
  def leakageFilter(keys: DataFrame, aPost: DataFrame, now: Double): DataFrame = {
    val aMin = aPost.groupBy("off").agg(min("score").as("amin"))
    keys.join(aMin, Seq("off"), "left_outer")
      .withColumn("nscore",
        when(col("amin").isNotNull, col("amin") - col("score"))
          .otherwise(lit(now) - col("score")))
      .filter(col("amin").isNull || col("score") < col("amin"))
      .select(col("key"), col("off"), col("nscore").as("score"))
  }

  // ---- A10: split-point search for continuous features ----

  /** The in-memory split search for one key's sorted (score, cls) pairs —
    * a faithful transcription of the prefix-scan argmax
    * (correlate.cc:273-341); cls = +1 A-only, 0 both, −1 B-only
    * (correlate.cc:243-292). The distributed plan runs splitRanges (the
    * window re-expression); this version pins the reference semantics in
    * CorrelateSpec, which asserts the two agree. Returns full range, or the
    * two sub-ranges (−inf, split] and [next, +inf). */
  def splitSearch(pairs: Seq[(Double, Int)], limitA: Long, limitB: Long,
      prior: Double): Seq[(Option[Double], Option[Double])] = {
    val full = Seq((None, None): (Option[Double], Option[Double]))
    if (pairs.isEmpty || pairs.size < math.min(limitA, limitB)) return Seq.empty
    val sorted = pairs.sorted
    // Cumulative counts at each DISTINCT score (last write per score wins —
    // correlate.cc:285-298).
    val agg = collection.mutable.ArrayBuffer.empty[(Double, Long, Long, Long)]
    var (ca, cb, cab) = (0L, 0L, 0L)
    for ((s, cls) <- sorted) {
      if (cls >= 0) ca += 1
      if (cls <= 0) cb += 1
      cab += 1
      if (agg.nonEmpty && agg.last._1 == s) agg(agg.size - 1) = (s, ca, cb, cab)
      else agg += ((s, ca, cb, cab))
    }
    def absLogit(a: Long, ab: Long): Double = {
      val p = (a + 1.0) / (ab + 2.0)
      math.abs(math.log(p / (1.0 - p)) - prior)
    }
    var bestIdx = 0
    var bestScore = 0.0
    for (i <- agg.indices) {
      val (_, a, b, ab) = agg(i)
      if (a >= limitA || b >= limitB) {
        val s = absLogit(a, ab)
        if (s > bestScore) { bestIdx = i; bestScore = s }
      }
      val (aa, bb, aab) = (ca - a, cb - b, cab - ab)
      if (aa >= limitA || bb >= limitB) {
        val s = absLogit(aa, aab)
        if (s > bestScore) { bestIdx = i; bestScore = s }
      }
    }
    if (bestIdx == 0 || bestIdx + 1 == agg.size || bestScore < math.log(1.05))
      full
    else
      Seq((None, Some(agg(bestIdx)._1)), (Some(agg(bestIdx + 1)._1), None))
  }

  /** Distributed A10: the SAME prefix-scan argmax as splitSearch
    * (correlate.cc:273-341), re-expressed as window aggregation so it stays in
    * Tungsten codegen: groupBy (key, score) → cumulative sums over a
    * key-partitioned window → candidate |logit|s for the (−inf, mid] and
    * (mid, ∞) cuts → first-encountered argmax via row_number (al desc,
    * ridx asc, lower-before-upper — splitSearch's strict-> scan order).
    *
    * Why not groupByKey.flatMapGroups: with few continuous keys every matched
    * row funnels into a handful of single-threaded JVM object loops (measured
    * 10.8s at sf0.1); windows keep per-key parallelism at any key count and
    * the double op sequence is identical, so the chosen cuts agree
    * bit-for-bit. `matched` columns: key, score, cls (+1 A-only / 0 both /
    * −1 B-only). Returns (key, lo, hi) with null = unbounded; keys whose
    * matched-pair count is below min(limitA, limitB) emit nothing
    * (correlate.cc:241).
    *
    * Measured-and-rejected restructures (r9, sf0.1, cold tracked caches;
    * keep for future rounds): (a) per-key totals as a groupBy aggregate
    * broadcast-joined back instead of the unbounded-frame windows — the
    * broadcast subplan races the main pipeline for the byScore cache and
    * duplicates the matched scan, 4.6s → 8.0s; (b) fusing the lower/upper
    * cut candidates row-locally before one argmax window (halves the passes
    * over `agg`) — 4.6s → 7.7s despite strictly fewer operators. The cached
    * cascade below is the fastest shape found. */
  def splitRanges(matched: DataFrame, limitA: Long, limitB: Long,
      prior: Double): DataFrame =
    splitRanges(matched, matched.sparkSession.range(1).select(
      lit(limitA).as("limit_a"), lit(limitB).as("limit_b"),
      lit(prior).as("prior")))

  /** splitRanges with the limits/prior as a broadcast 1-row frame
    * (`sizesOf`) instead of driver scalars — the shape `run` uses so the
    * whole CORRELATE statement stays one lazy plan with no up-front count
    * action. The constant columns ride the (key, score) aggregate rows;
    * every comparison consumes the same doubles the scalar overload would
    * inline, so the chosen cuts agree bit-for-bit. */
  def splitRanges(matched: DataFrame, sizes: DataFrame): DataFrame = {
    val byScore = matched.groupBy("key", "score").agg(
      sum(when(col("cls") >= 0, 1L).otherwise(0L)).as("ca_s"),
      sum(when(col("cls") <= 0, 1L).otherwise(0L)).as("cb_s"),
      count(lit(1)).as("cab_s"))
    val ord = Window.partitionBy("key").orderBy("score")
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("key")
    // cached: agg is one row per distinct (key, score) of the matched set —
    // compact — and feeds FOUR consumers (lower, upper, the full-range
    // fallback's key set, and via them the chosen-cut argmax); uncached, each
    // consumer re-runs the index scan + membership joins + window shuffle
    // (measured 2× slower overall than the flatMapGroups it replaces).
    val agg = graft.util.Caches.track(byScore.select(col("key"), col("score"),
        sum("ca_s").over(cum).as("ca"),
        sum("cb_s").over(cum).as("cb"),
        sum("cab_s").over(cum).as("cab"),
        row_number().over(ord).as("ridx"),
        count(lit(1)).over(all).as("nagg"),
        lead("score", 1).over(ord).as("next_score"),
        sum("ca_s").over(all).as("ta"),
        sum("cb_s").over(all).as("tb"),
        sum("cab_s").over(all).as("tab"))
      .crossJoin(broadcast(sizes.select("limit_a", "limit_b", "prior")))
      .filter(col("tab") >= least(col("limit_a"), col("limit_b"))) // pairs.size gate
      .cache())

    // identical double op sequence as splitSearch.absLogit
    def absLogit(a: Column, ab: Column): Column = {
      val p = (a + lit(1.0)) / (ab + lit(2.0))
      abs(log(p / (lit(1.0) - p)) - col("prior"))
    }
    val lower = agg
      .filter(col("ca") >= col("limit_a") || col("cb") >= col("limit_b"))
      .select(col("key"), col("ridx"), col("nagg"), col("score").as("mid"),
        col("next_score"), lit(0).as("is_upper"),
        absLogit(col("ca"), col("cab")).as("al"))
    val upper = agg
      .filter(col("ta") - col("ca") >= col("limit_a") ||
        col("tb") - col("cb") >= col("limit_b"))
      .select(col("key"), col("ridx"), col("nagg"), col("score").as("mid"),
        col("next_score"), lit(1).as("is_upper"),
        absLogit(col("ta") - col("ca"), col("tab") - col("cab")).as("al"))
    val chosen = lower.unionByName(upper)
      .withColumn("rn", row_number().over(Window.partitionBy("key")
        .orderBy(desc("al"), asc("ridx"), asc("is_upper"))))
      .filter(col("rn") === 1)
    // boundary or insignificant cuts fall back to the full range; ≤1 row per
    // key — cached so splitTwo (×2) and the anti-join don't re-run the argmax
    val split = graft.util.Caches.track(
      chosen.filter(col("ridx") > 1 && col("ridx") < col("nagg") &&
        col("al") >= lit(math.log(1.05))).cache())
    val splitTwo = split
      .select(col("key"), lit(null).cast("double").as("lo"), col("mid").as("hi"))
      .unionByName(split.select(col("key"), col("next_score").as("lo"),
        lit(null).cast("double").as("hi")))
    val fullRange = agg.select("key").distinct()
      .join(split.select("key"), Seq("key"), "left_anti")
      .select(col("key"), lit(null).cast("double").as("lo"),
        lit(null).cast("double").as("hi"))
    splitTwo.unionByName(fullRange)
  }

  /** The per-key MATCHED/SPLIT intermediate of the full CORRELATE pipeline:
    * every chosen range's in-range postings that match either membership
    * set, with the set-size constants riding along — one row per
    * (key, lo, hi, off), columns in_a/in_b (1 or null) and the 1-row
    * `sizesOf` constants (n_a, n_b, limit_a, limit_b, prior) broadcast onto
    * each row. `scoreMatched` folds this to the final report; `run` chains
    * the two, and `Catalog.correlateMatched` materializes THIS frame once
    * per sf-dir (the dupPairs posture) so the statement serves with a read
    * + one aggregation instead of re-running the split search per
    * invocation (VERDICT r15 #1). Rows matching neither set are dropped
    * here: they contribute 0 to every count and their all-zero groups
    * cannot pass the ≥limit support gate (limits are ≥1), so the fold is
    * unchanged — pinned by CorrelateSpec's stored==fresh law.
    *
    * Boolean keys score over their full range; continuous keys run the
    * distributed split search (the windowed prefix-scan argmax) and
    * re-score each chosen range over the raw postings
    * (correlate.cc:343-357: duplicate key offsets force a recount).
    * |A|/|B|/limits/prior thread through as a broadcast 1-row frame
    * (`sizesOf`), NOT driver scalars, so the whole statement is ONE lazy
    * plan — a single job wave at action time. The reference evaluates its
    * sets eagerly (correlate.cc:497-518) because its scalars live in the
    * same process; here an eager collect costs a driver-scheduled job wave
    * that inflated 5-20× in three consecutive loaded-environment bench
    * rounds (VERDICT r13 #3). */
  def matchedRanges(spark: SparkSession, t: Tables, a: Query, b: Query,
      now: Double = 0.0): DataFrame = {
    val c = new QueryCompiler(spark, t)
    val pa = dedupMin(c.compile(a).postings)
    val pb = subtract(dedupMin(c.compile(b).postings), pa)
    // the tagged membership union feeds the size aggregate, the class join
    // and the range re-score — cache once instead of re-evaluating per
    // consumer; tracked so the presenter can release it
    // post-materialization. The cache populates inside the one action's
    // first stage that touches it and every later consumer in the same
    // job reads the cached blocks.
    val mem = graft.util.Caches.track(
      membership(pa.select("off"), pb.select("off")).cache())
    // 1 row; cached so the several crossJoin sites below share one
    // materialization of the count aggregate instead of re-scanning the
    // cached union per site
    val sizes = graft.util.Caches.track(sizesOf(mem).cache())

    // Time-leakage handling (correlate.cc:524-563): when A's primary keyword
    // is timestamped, ephemeral keys are skipped entirely and timestamped
    // keys are leakage-filtered (against B's dates, or `now` when B is not
    // timestamped). The reference dispatches per key in a loop
    // (correlate.cc:522-572); here the keywords.yaml filter lists compile to
    // column predicates evaluated inside the scan — the key vocabulary
    // (every indexed keyword, unbounded at corpus scale) never reaches the
    // driver.
    val aTs = primaryKeyword(a).exists(Keywords.isTimestamped)
    val bTs = primaryKeyword(b).exists(Keywords.isTimestamped)
    val tsPred = Keywords.timestampedCol(col("key"))
    val adjIdx =
      if (!aTs) t.index
      else {
        // project to the posting shape FIRST: leakageFilter returns
        // (key, off, score), and a band-carrying index (Catalog.index has
        // pct5..pct95) would make the unionByName below an
        // AnalysisException (review finding, r19 — every prior fixture
        // was an ad-hoc 3-column index, so the path went unexercised)
        val baseIdx = t.index.select("key", "off", "score")
          .filter(!Keywords.ephemeralCol(col("key")))
        val ts = baseIdx.filter(tsPred)
        val filtered = if (bTs) leakageFilter(ts, pa, pb)
          else leakageFilter(ts, pa, now)
        baseIdx.filter(!tsPred).unionByName(filtered)
      }

    // Support gate on RAW posting counts (checked before the filter,
    // correlate.cc:541-542); continuity likewise from the raw scores.
    // Cached (tracked): TWO consumers (the continuity join on the index
    // and the boolean full-range arm) would otherwise each re-run the
    // full-index aggregation inside the one action. One row per surviving
    // key — vocabulary-sized, and MEMORY_AND_DISK spills rather than
    // capping the key count.
    val keyMeta = graft.util.Caches.track(t.index.groupBy("key").agg(
      count(lit(1)).as("key_n"),
      max(when(col("score") =!= 0.0, 1).otherwise(0)).as("continuous"))
      .crossJoin(broadcast(sizes.select("limit_a", "limit_b")))
      .filter(col("key_n") >= least(col("limit_a"), col("limit_b")))
      .cache())

    // keyMeta is VOCABULARY-sized — one row per distinct key, unbounded at
    // corpus scale — so it must not carry a broadcast hint (the same class
    // as the r8 tf-idf/log-prob finding). Statically it is post-agg and
    // opaque to Catalyst, but AQE sees the real size after the aggregate's
    // shuffle and converts to a runtime broadcast whenever it actually
    // fits; at 100 TB it stays a shuffle join on `key`, which is correct.
    val idx = adjIdx.join(keyMeta.select("key", "continuous"), Seq("key"))

    // Ranges: boolean keys → full range; continuous keys → the distributed
    // split search (windowed prefix-scan argmax) over matched (score, cls)
    // pairs.
    // the membership union is QUERY-RESULT-sized (every matching offset) —
    // hint-broadcasting it caps the engine at queries whose result fits
    // on the driver. Unhinted, AQE runtime-broadcasts the cached union
    // when small and shuffle-joins on `off` when not. A matched row has
    // both flags non-null; A/B are disjoint so cls = in_a − in_b ∈ {±1}.
    val matched = idx.filter(col("continuous") === 1)
      .join(mem, Seq("off"), "left_outer")
      .filter(col("in_a").isNotNull)
      .select(col("key"), col("score"),
        (col("in_a") - col("in_b")).as("cls"))
    val contRanges = splitRanges(matched, sizes)
    val boolRanges = keyMeta.filter(col("continuous") === 0)
      .select(col("key"), lit(null).cast("double").as("lo"),
        lit(null).cast("double").as("hi"))
    val ranges = contRanges.unionByName(boolRanges)

    // Re-score each (key, range) over distinct in-range key offsets
    // (ProcessRange, correlate.cc:84-148). Range bounds are inclusive.
    // `ranges` is ≤2 rows per CONTINUOUS key — also vocabulary-class, so no
    // hint; AQE broadcasts it at runtime when it fits.
    val inRange = adjIdx.join(ranges, Seq("key"))
      .filter((col("lo").isNull || col("score") >= col("lo")) &&
        (col("hi").isNull || col("score") <= col("hi")))
      .select("key", "lo", "hi", "off").distinct()
    inRange
      .join(mem, Seq("off"), "left_outer")
      .filter(col("in_a").isNotNull)
      .crossJoin(broadcast(sizes))
  }

  /** Fold the matched/split intermediate to the final CORRELATE report:
    * per-range match counts → support gate → log-odds → significance
    * cutoff (ProcessRange, correlate.cc:84-148). The `sizesOf` constants
    * ride the grouping keys (constant per statement), so the stored path
    * needs no side lookup. Every input row matches A or B, so
    * cnt_a_or_b = count(*).
    * Returns (key, min_score, max_score, log_odds, cnt_a, cnt_b). */
  def scoreMatched(m: DataFrame): DataFrame =
    // summing the per-row-coalesced membership flags counts A/B hits under
    // BOTH flag encodings a store may carry — the current 0/1 union tags
    // and the pre-r16 1/null join markers — and keeps a one-sided group's
    // other count at 0 instead of NULL (a NULL cnt would null the log-odds
    // and silently drop the row at the significance filter)
    m.groupBy("key", "lo", "hi", "n_a", "n_b", "limit_a", "limit_b", "prior")
      .agg(
        sum(coalesce(col("in_a"), lit(0))).as("cnt_a"),
        sum(coalesce(col("in_b"), lit(0))).as("cnt_b"),
        count(lit(1)).as("cnt_a_or_b"))
      // the reference's nA==0/nB==0 early exit (correlate.cc:497-510),
      // declaratively: an empty side empties the result set
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .filter(col("cnt_a") >= col("limit_a") || col("cnt_b") >= col("limit_b"))
      .withColumn("log_odds",
        log((col("cnt_a") + 1.0) / (col("cnt_a_or_b") - col("cnt_a") + 1.0))
          - col("prior"))
      .filter(abs(col("log_odds")) >= lit(math.log(0.55 / 0.45)))
      .select(col("key"), col("lo").as("min_score"), col("hi").as("max_score"),
        round(col("log_odds"), 6).as("log_odds"), col("cnt_a"), col("cnt_b"))

  /** Full CORRELATE, live: the matched/split intermediate chained into the
    * scoring fold. Statement serving goes through the materialized
    * intermediate instead (Catalog.correlateMatched); this live path builds
    * that store and pins its equivalence in CorrelateSpec. */
  def run(spark: SparkSession, t: Tables, a: Query, b: Query,
      now: Double = 0.0): DataFrame =
    scoreMatched(matchedRanges(spark, t, a, b, now))
}
