package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — the aggregation primitives a
  * 100 TB deployment runs INSTEAD of exact distinct-counts and exact
  * heavy-hitter tables. All three sketches here are deterministic: element
  * hashes derive from md5 (the repo-wide uniform-hash convention, exactly
  * reproducible in the DuckDB oracle), so the sketch CONTENTS — not just the
  * estimates — are bit-identical across engines, runs, and partitionings.
  *
  * Scale posture: each sketch is a bounded-size mergeable summary, which is
  * the whole point — partial aggregation combines per-partition sketches
  * map-side (max for HLL registers, min-k for KMV, counter-sum for CMS), so
  * the shuffle carries kilobytes per group no matter how many terabytes were
  * scanned. SketchesSpec pins the merge laws (split-then-merge == global).
  *
  * References: KMV / k-minimum-values (Bar-Yossef et al., RANDOM 2002;
  * Beyer et al., SIGMOD 2007), HyperLogLog (Flajolet et al., AofA 2007),
  * count-min sketch (Cormode & Muthukrishnan, J.Alg 2005). The reference
  * engine keeps exact per-key counts (/root/reference/src/query.cc result
  * counting); these are the published approximations that replace them once
  * a key's cardinality no longer fits a node.
  */
object Sketches {

  /** KMV k = 64: estimate = (k-1) * 2^48 div h_k. 48-bit hashes (12 md5 hex
    * chars) keep every intermediate exact in BIGINT arithmetic — the
    * estimate itself is an integer division, so cross-engine equality is
    * exact, no rounding mask. */
  val KmvK = 64

  /** HLL p = 8: m = 256 registers; rho counted over the next 40 hash bits.
    * alpha_m * m^2 as one Scala-computed double constant, embedded verbatim
    * into the oracle via toString (shortest round-trip repr → the identical
    * double on the DuckDB side). */
  val HllM = 256
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0

  /** CMS: d = 4 rows × w = 512 counters; point query = min over the d rows. */
  val CmsD = 4
  val CmsW = 512

  private def hash48(salt: String, c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  /** Distinct users per event_type via a k-minimum-values sketch.
    *
    * One distinct-aggregation of (type, hash) pairs (map-side combined),
    * then a rank<=k window that Spark rewrites into WindowGroupLimit — each
    * executor forwards at most k hashes per group, which IS the KMV merge
    * step: the union of per-partition min-k sets contains the global min-k.
    * A group with fewer than k distinct hashes reports its exact count
    * (max rn < k ⇒ the sketch saw everything). */
  def kmvDistinct(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("h")
    events
      .select(col("event_type"), hash48("kmv:", col("user_id")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .groupBy("event_type")
      .agg(max("rn").as("n_kept"), max("h").as("kth_hash"))
      .select(col("event_type"), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < KmvK, col("n_kept").cast("long"))
          .otherwise(expr(
            s"CAST(${KmvK - 1} AS BIGINT) * 281474976710656 div kth_hash"))
          .as("est_distinct"))
  }

  /** KMV SET OPERATIONS (Beyer et al., SIGMOD 2007 §4): union size,
    * intersection size, and Jaccard estimated from two per-set min-k
    * sketches alone. min-k of the union is computable from the two kept
    * sets (the merge law), the Jaccard estimator is the intersection
    * fraction WITHIN the union's min-k, and the intersection estimate is
    * the integer product ρ·|A∪B| — every step exact BIGINT arithmetic
    * except the reported ρ itself. Per-set min-k uses orderBy+limit,
    * which Spark executes as TakeOrdered (per-partition top-k, then a
    * k-bounded merge — no single-partition window, no full sort), so
    * each set contributes at most k rows to everything downstream. */
  def kmvSetOps(usersA: DataFrame, usersB: DataFrame): DataFrame = {
    def kept(u: DataFrame) = u
      .select(hash48("kmv:", col("user_id")).as("h")).distinct()
      .orderBy("h").limit(KmvK)
    // membership rides provenance flags through the union (max-merged per
    // hash), so each slice is scanned exactly ONCE — no join back against
    // the slice, the sketches themselves carry the set algebra
    val ka = kept(usersA).select(col("h"), lit(1L).as("ina"), lit(0L).as("inb"))
    val kb = kept(usersB).select(col("h"), lit(0L).as("ina"), lit(1L).as("inb"))
    val uk = ka.unionByName(kb)
      .groupBy("h").agg(max("ina").as("ina"), max("inb").as("inb"))
      .orderBy("h").limit(KmvK)
    uk.agg(count(lit(1)).as("n_kept"), max("h").as("kth_hash"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L)
          .otherwise(0L)).as("inter_cnt"))
      .withColumn("est_union",
        when(col("n_kept") < KmvK, col("n_kept"))
          .otherwise(expr(
            s"CAST(${KmvK - 1} AS BIGINT) * 281474976710656 div kth_hash")))
      .select(col("n_kept"), col("kth_hash"), col("inter_cnt"),
        col("est_union"),
        // n_kept = 0 (both slices empty) must not reach the division:
        // Spark's div yields NULL there while DuckDB's // raises — pin the
        // degenerate estimate to 0 in BOTH renderings instead
        when(col("n_kept") === 0, lit(0L))
          .otherwise(expr("inter_cnt * est_union div n_kept"))
          .as("est_intersection"),
        when(col("n_kept") === 0, lit(0.0))
          .otherwise(round(col("inter_cnt") / col("n_kept"), 6))
          .as("jaccard"))
  }

  /** Oracle for kmvSetOps over A = click users, B = high-value users. */
  def kmvSetOpsOracleSql(minValueB: Int): String =
    s"""WITH ha AS (SELECT DISTINCT
       |    ('0x'||substr(md5('kmv:'||user_id),1,12))::BIGINT AS h
       |    FROM events WHERE event_type = 'click'),
       |  hb AS (SELECT DISTINCT
       |    ('0x'||substr(md5('kmv:'||user_id),1,12))::BIGINT AS h
       |    FROM events WHERE value >= $minValueB),
       |  ka AS (SELECT h FROM ha ORDER BY h LIMIT $KmvK),
       |  kb AS (SELECT h FROM hb ORDER BY h LIMIT $KmvK),
       |  uk AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       |    ORDER BY h LIMIT $KmvK),
       |  agg AS (SELECT count(*) AS n_kept, max(h) AS kth_hash,
       |    sum(CASE WHEN h IN (SELECT h FROM ka)
       |          AND h IN (SELECT h FROM kb) THEN 1 ELSE 0 END) AS ic
       |    FROM uk),
       |  est AS (SELECT n_kept, kth_hash, CAST(ic AS BIGINT) AS inter_cnt,
       |    CASE WHEN n_kept < $KmvK THEN n_kept
       |         ELSE (${KmvK - 1} * 281474976710656) // kth_hash
       |    END AS est_union FROM agg)
       |SELECT n_kept, kth_hash, inter_cnt, est_union,
       |  CASE WHEN n_kept = 0 THEN 0
       |       ELSE inter_cnt * est_union // n_kept END AS est_intersection,
       |  CASE WHEN n_kept = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(inter_cnt / n_kept, 6) END AS jaccard
       |FROM est""".stripMargin.replaceAll("\\s+", " ")

  def kmvOracleSql: String =
    s"""WITH d AS (SELECT DISTINCT event_type,
       |    ('0x'||substr(md5('kmv:'||user_id),1,12))::BIGINT AS h FROM events),
       |  r AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM d)
       |SELECT event_type, max(rn) AS n_kept, max(h) AS kth_hash,
       |  CASE WHEN max(rn) < $KmvK THEN max(rn)
       |       ELSE (${KmvK - 1} * 281474976710656) // max(h) END AS est_distinct
       |FROM r WHERE rn <= $KmvK GROUP BY 1""".stripMargin
      .replaceAll("\\s+", " ")

  /** HyperLogLog registers (p = 8) for an arbitrary group key: max rho per
    * (group, register). Mergeable by construction — max-merging two
    * register frames is the HLL union, so partial aggregation IS sketch
    * merge. Register index = first 2 md5 hex chars; rho = leading-zero
    * count of the next 40 bits + 1, computed as 41 - bit_length via
    * `bin()` (minimal-width binary string in BOTH engines). */
  def hllRegistersKeyed(events: DataFrame, keys: Seq[String]): DataFrame = {
    val hx = md5(concat(lit("hll:"), col("user_id").cast("string")))
    val reg = conv(substring(hx, 1, 2), 16, 10).cast("int")
    val w = conv(substring(hx, 3, 10), 16, 10).cast("long")
    val rho = when(w === 0, lit(41)).otherwise(lit(41) - length(bin(w)))
    events
      .select(keys.map(col) :+ reg.as("reg") :+ rho.as("rho"): _*)
      .groupBy((keys :+ "reg").map(col): _*).agg(max("rho").as("mr"))
  }

  def hllRegisters(events: DataFrame): DataFrame =
    hllRegistersKeyed(events, Seq("event_type"))

  /** Harmonic fold + linear-counting correction over a register frame.
    * Every 2^-rho term is an exact power of two with granularity >= 2^-41,
    * so the 256-term sum is EXACT in doubles regardless of accumulation
    * order; only the final ln/divide needs the round-4 mask, and the
    * small-range branch condition is computed from exact inputs, so both
    * engines take the same branch. */
  def hllFoldKeyed(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val raw = lit(HllAlphaM2) / col("sinv")
    regs
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("int").as("present"),
        (lit(HllM) - count(lit(1)) +
          sum(pow(lit(2.0), -col("mr")))).as("sinv"))
      .select(keys.map(col) :+ col("present") :+
        round(
          when(raw <= lit(2.5 * HllM) && col("present") < HllM,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) /
              (lit(HllM) - col("present"))))
            .otherwise(raw), 4).as("est_distinct"): _*)
  }

  def hllFold(regs: DataFrame): DataFrame =
    hllFoldKeyed(regs, Seq("event_type"))

  /** Distinct users per DAY estimated from daily register sketches — the
    * time-windowed composition (a deployment keeps one 256-register row
    * set per (window, key) and answers any distinct-users-over-time
    * question by max-merging the windows it needs; contrast
    * ev_active_users, which pays the exact rolling distinct). */
  def hllDaily(events: DataFrame): DataFrame =
    hllFoldKeyed(
      hllRegistersKeyed(
        events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
        Seq("day")),
      Seq("day"))

  def hllDailyOracleSql: String =
    s"""WITH h AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
       |    ('0x'||substr(md5('hll:'||user_id),1,2))::BIGINT AS reg,
       |    ('0x'||substr(md5('hll:'||user_id),3,10))::BIGINT AS w
       |    FROM events),
       |  r AS (SELECT day, reg,
       |    max(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS mr
       |    FROM h GROUP BY 1, 2),
       |  a AS (SELECT day, CAST(count(*) AS INTEGER) AS present,
       |    $HllM - count(*) + sum(power(2.0::DOUBLE, -mr)) AS sinv
       |    FROM r GROUP BY 1)
       |SELECT day, present,
       |  round(CASE WHEN ${HllAlphaM2}::DOUBLE / sinv <= ${2.5 * HllM}::DOUBLE
       |               AND present < $HllM
       |         THEN ${HllM.toDouble}::DOUBLE
       |              * ln(${HllM.toDouble}::DOUBLE / ($HllM - present))
       |         ELSE ${HllAlphaM2}::DOUBLE / sinv END, 4) AS est_distinct
       |FROM a""".stripMargin
      .replaceAll("\\s+", " ")

  /** Rolling `days`-day distinct users from the DAILY register sketches —
    * the sketch answer to the exact question rollingActiveUsers pays for
    * (same dense-grid window semantics: every day in [min, max], trailing
    * window, zero-filled gaps). The exact rewrite explodes |user-day| ×
    * days rows; this explodes |day × <=256 registers| × days — the
    * shuffle is calendar-sized, not audience-sized, which is the entire
    * reason a 100 TB deployment keeps daily sketch rows. */
  def hllRolling(events: DataFrame, days: Int = 7): DataFrame = {
    val regs = hllRegistersKeyed(
      events.withColumn("day", unix_date(to_date(col("ts"))).cast("long")),
      Seq("day"))
    val grid = regs.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val merged = regs
      .select(col("reg"), col("mr"),
        explode(sequence(col("day"), col("day") + (days - 1))).as("d"))
      .groupBy("d", "reg").agg(max("mr").as("mr"))
    hllFoldKeyed(merged, Seq("d"))
      .join(grid, Seq("d"), "right")
      .select(col("d"), coalesce(col("present"), lit(0)).as("present"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"))
  }

  def hllRollingOracleSql(days: Int = 7): String =
    s"""WITH h AS (SELECT
       |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |    ('0x'||substr(md5('hll:'||user_id),1,2))::BIGINT AS reg,
       |    ('0x'||substr(md5('hll:'||user_id),3,10))::BIGINT AS w
       |    FROM events),
       |  r AS (SELECT day, reg,
       |    max(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS mr
       |    FROM h GROUP BY 1, 2),
       |  x AS (SELECT u.d, reg, max(mr) AS mr FROM r,
       |    unnest(generate_series(day, day + ${days - 1})) AS u(d)
       |    GROUP BY 1, 2),
       |  a AS (SELECT d, CAST(count(*) AS INTEGER) AS present,
       |    $HllM - count(*) + sum(power(2.0::DOUBLE, -mr)) AS sinv
       |    FROM x GROUP BY 1),
       |  f AS (SELECT d, present,
       |    round(CASE WHEN ${HllAlphaM2}::DOUBLE / sinv
       |                 <= ${2.5 * HllM}::DOUBLE AND present < $HllM
       |           THEN ${HllM.toDouble}::DOUBLE
       |                * ln(${HllM.toDouble}::DOUBLE / ($HllM - present))
       |           ELSE ${HllAlphaM2}::DOUBLE / sinv END, 4) AS est_distinct
       |    FROM a),
       |  grid AS (SELECT unnest(generate_series(lo, hi)) AS d
       |    FROM (SELECT min(day) AS lo, max(day) AS hi FROM r))
       |SELECT grid.d AS d, coalesce(f.present, 0) AS present,
       |  coalesce(f.est_distinct, 0.0) AS est_distinct
       |FROM grid LEFT JOIN f ON grid.d = f.d""".stripMargin
      .replaceAll("\\s+", " ")

  def hllDistinct(events: DataFrame): DataFrame =
    hllFold(hllRegisters(events))

  def hllOracleSql: String =
    s"""WITH h AS (SELECT event_type,
       |    ('0x'||substr(md5('hll:'||user_id),1,2))::BIGINT AS reg,
       |    ('0x'||substr(md5('hll:'||user_id),3,10))::BIGINT AS w FROM events),
       |  r AS (SELECT event_type, reg,
       |    max(CASE WHEN w = 0 THEN 41 ELSE 41 - length(bin(w)) END) AS mr
       |    FROM h GROUP BY 1, 2),
       |  a AS (SELECT event_type, CAST(count(*) AS INTEGER) AS present,
       |    $HllM - count(*) + sum(power(2.0::DOUBLE, -mr)) AS sinv
       |    FROM r GROUP BY 1)
       |SELECT event_type, present,
       |  round(CASE WHEN ${HllAlphaM2}::DOUBLE / sinv <= ${2.5 * HllM}::DOUBLE
       |               AND present < $HllM
       |         THEN ${HllM.toDouble}::DOUBLE
       |              * ln(${HllM.toDouble}::DOUBLE / ($HllM - present))
       |         ELSE ${HllAlphaM2}::DOUBLE / sinv END, 4) AS est_distinct
       |FROM a""".stripMargin
      .replaceAll("\\s+", " ")

  /** The sketch-accuracy gate — the ann_recall pattern applied to
    * cardinality sketches: exact distinct, KMV estimate, HLL estimate,
    * and both relative errors side by side, per group, as a
    * driver-checked entry. The exact side is the expensive path the
    * sketches exist to replace; keeping it in the gate (only) is what
    * makes the error claim auditable. */
  def errorGate(events: DataFrame): DataFrame = {
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_n"))
    val kmv = kmvDistinct(events)
      .select(col("event_type"), col("est_distinct").as("kmv_est"))
    val hll = hllDistinct(events)
      .select(col("event_type"), col("est_distinct").as("hll_est"))
    exact.join(kmv, Seq("event_type")).join(hll, Seq("event_type"))
      .select(col("event_type"), col("exact_n"), col("kmv_est"),
        round(abs(col("kmv_est") - col("exact_n")) / col("exact_n"), 4)
          .as("kmv_err"),
        col("hll_est"),
        round(abs(col("hll_est") - col("exact_n")) / col("exact_n"), 4)
          .as("hll_err"))
  }

  def errorGateOracleSql: String =
    s"""WITH k AS ($kmvOracleSql), h AS ($hllOracleSql),
       |e AS (SELECT event_type, count(DISTINCT user_id) AS exact_n
       |      FROM events GROUP BY 1)
       |SELECT e.event_type AS event_type, e.exact_n,
       |  k.est_distinct AS kmv_est,
       |  round(abs(k.est_distinct - e.exact_n) / e.exact_n, 4) AS kmv_err,
       |  h.est_distinct AS hll_est,
       |  round(abs(h.est_distinct - e.exact_n) / e.exact_n, 4) AS hll_err
       |FROM e JOIN k ON e.event_type = k.event_type
       |  JOIN h ON e.event_type = h.event_type""".stripMargin
      .replaceAll("\\s+", " ")

  /** Heavy hitters with a count-min frequency audit: the top 40 corpus
    * tokens with their exact frequency next to the CMS point estimate
    * (est >= freq always; equality when the token's d counters saw no
    * collisions). Counter build = one exploded aggregation of (row, col)
    * scalars — 2048 cells total, mergeable by plain summation; the point
    * query is a d-row equi-join against those cells followed by a min. */
  /** All d row-hashes derive from ONE md5 per token (VERDICT r17 #4): row
    * j reads the j-th disjoint 6-hex-char span of the same digest (4×6 =
    * 24 of md5's 32 hex chars — the 60-bit-hash convention applied to the
    * grid). One digest per token instead of d was the entire CPU story of
    * the stream ingest: md5 dominates, the span slicing is free. The
    * digest is materialized as a `hx` column (cmsWithHex) rather than
    * repeated inside each struct so the single evaluation is guaranteed
    * by the plan, not left to codegen subexpression elimination. */
  private def cmsWithHex(df: DataFrame): DataFrame =
    df.withColumn("hx", md5(concat(lit("cms:"), col("token"))))

  private def cmsCellExprs = (0 until CmsD).map { j =>
    struct(lit(j).as("j"),
      (conv(substring(col("hx"), 1 + 6 * j, 6), 16, 10).cast("long")
        % CmsW).as("c"))
  }

  /** Counter grid from RAW token occurrences — the streaming build shape
    * (sum-typed state, bounded at d×w = 2048 rows however much text flows
    * through; contrast the HLL registers' max-typed state). Values are
    * identical to the freq-folded batch build. */
  def cmsCells(toks: DataFrame): DataFrame =
    cmsWithHex(toks).select(explode(array(cmsCellExprs: _*)).as("rc"))
      .groupBy(col("rc.j").as("j"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Heavy-hitter report against an EXTERNALLY-maintained counter grid
    * (e.g. the streamed one) — the serve end of the CMS lifecycle. */
  def cmsHeavyHittersFrom(docs: DataFrame, counters: DataFrame,
      topN: Int): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val keys = cmsWithHex(toks.groupBy("token").agg(count(lit(1)).as("freq")))
      .select(col("token"), col("freq"),
        explode(array(cmsCellExprs: _*)).as("rc"))
      .select(col("token"), col("freq"),
        col("rc.j").as("j"), col("rc.c").as("c"))
    keys.join(counters, Seq("j", "c"))
      .groupBy("token", "freq").agg(min("cnt").as("cms_est"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topN)
  }

  def cmsHeavyHitters(docs: DataFrame, topN: Int = 40): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val cells = cmsCellExprs
    // the counter grid folds the VOCAB-sized freq table (sum of freq per
    // cell == count of raw occurrences, exactly), so the 4x explode never
    // touches corpus rows. The freq aggregation is re-evaluated on the
    // join's build side when exchange reuse doesn't fire — the same
    // documented second-scan trade as bm25_topk_batch; a deployment
    // serving CMS repeatedly stores freq as a sidecar and pays neither
    val freq = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    val keys = cmsWithHex(freq).select(col("token"), col("freq"),
      explode(array(cells: _*)).as("rc"))
      .select(col("token"), col("freq"),
        col("rc.j").as("j"), col("rc.c").as("c"))
    val counters = keys.groupBy("j", "c").agg(sum("freq").as("cnt"))
    keys
      .join(counters, Seq("j", "c"))
      .groupBy("token", "freq").agg(min("cnt").as("cms_est"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topN)
  }

  def cmsOracleSql(topN: Int = 40): String =
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
       |    FROM documents),
       |  k AS (SELECT token, j,
       |    ('0x'||substr(md5('cms:'||token),1+6*j,6))::BIGINT % $CmsW AS c
       |    FROM (SELECT DISTINCT token FROM t),
       |         (SELECT unnest(generate_series(0, ${CmsD - 1})) AS j)),
       |  cnt AS (SELECT j, c, count(*) AS cnt FROM t JOIN k USING (token)
       |    GROUP BY 1, 2),
       |  f AS (SELECT token, count(*) AS freq FROM t GROUP BY 1)
       |SELECT f.token AS token, f.freq AS freq, min(cnt.cnt) AS cms_est
       |FROM f JOIN k ON f.token = k.token
       |  JOIN cnt ON k.j = cnt.j AND k.c = cnt.c
       |GROUP BY 1, 2 ORDER BY freq DESC, f.token LIMIT $topN""".stripMargin
      .replaceAll("\\s+", " ")

  // ---- Log-linear quantile sketch (the HdrHistogram bucket law) -----------

  /** Sub-bucket bits for the LOG-LINEAR QUANTILE SKETCH (the HdrHistogram
    * family; the log-linear histograms of Masson et al. VLDB 2019 §related):
    * a value keeps its top s+1 significant bits, so every bucket spans at
    * most a 2^-s fraction of its lower bound and ANY rank query answers
    * within 1/16 relative error from bounded state. Chosen over DDSketch's
    * ceil(log_γ x) indexing because bit-length bucketing is EXACT INTEGER
    * arithmetic — ln() is not identically rounded across libms, and a
    * 1-ulp flip at a bucket boundary would hash-diverge the oracle. */
  val HdrSubBits = 4

  /** `value` as exact integer cents. The inputs are 2-decimal money-style
    * doubles, so value*100 lands within a few ulps of an integer — never
    * near a .5 boundary — and round() is engine-identical. NON-NEGATIVE by
    * contract: bin() on a negative long renders the 64-char
    * two's-complement string, which would silently bucket garbage (shift
    * 59), so the grid builder FAILS LOUDLY on a negative value instead
    * (ADVICE r18) — a deployment with signed measures offsets or splits
    * by sign before sketching. */
  private def centsCol =
    // NULL (an absent optional measure) propagates as NULL cents, which
    // the grid count simply never sees — only a genuinely NEGATIVE value
    // reaches the raise_error branch (review finding: `value >= 0` is
    // NULL on NULL input and would otherwise fall through to the error)
    expr("""CASE WHEN value >= 0 THEN CAST(round(value * 100) AS BIGINT)
      WHEN value IS NULL THEN CAST(NULL AS BIGINT)
      ELSE CAST(raise_error('hdrGrid: negative value - the log-linear bucket law is defined on non-negative measures') AS BIGINT) END""")

  /** The sketch state — (event_type, shift, w, cnt): m = bit-length(cents)
    * via bin() (the HLL rho convention: minimal-width binary in BOTH
    * engines), shift = max(m−(s+1), 0), w = cents >> shift. Values under
    * 2^(s+1) are EXACT (shift 0); larger ones keep their top s+1 bits.
    * Bucketing is monotone in the value and lower bounds (w << shift) are
    * globally unique, so bucket order IS value order. Mergeable by plain
    * count addition — partial aggregation is the sketch merge, and the
    * state is bounded at ~(s+1)·2^s·64 rows per group however many events
    * flow through (the CMS posture with a quantile answer). */
  def hdrGrid(events: DataFrame): DataFrame =
    hdrGridKeyed(events, Seq("event_type"))

  /** The grid under ARBITRARY grouping keys (e.g. event_type × day) — the
    * time-sliceable layout: per-key bounded state, sum-mergeable across
    * any key range at serve (the hllRegistersKeyed posture). */
  private def hdrGridKeyed(df: DataFrame, keys: Seq[String]): DataFrame =
    df
      .select(keys.map(col) :+ centsCol.as("c"): _*)
      // an absent (NULL) measure contributes NOTHING — without this
      // filter the row would land in a garbage (shift 0, w NULL) bucket,
      // since groupBy counts rows, not values (review finding, r19)
      .filter(col("c").isNotNull)
      .withColumn("shift",
        greatest(length(bin(col("c"))) - lit(HdrSubBits + 1), lit(0)))
      .select(keys.map(col) :+ col("shift") :+
        expr("shiftright(c, shift)").as("w"): _*)
      .groupBy((keys :+ "shift" :+ "w").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Discrete quantile report from a bucket grid (possibly streamed or
    * stored): per event_type, the sketch's p50/p95/p99 in cents — the
    * lower bound of the first bucket whose cumulative count reaches the
    * Bands rank rule ceil(k·n/100) = (k·n+99) div 100 (pure integer, the
    * repo's discrete-quantile convention). The window runs over the
    * BOUNDED grid (≤ a few hundred rows per group), never the events. */
  def hdrQuantilesFrom(grid: DataFrame): DataFrame =
    hdrQuantilesKeyed(grid, Seq("event_type"))

  private def hdrQuantilesKeyed(grid: DataFrame,
      keys: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val g = grid
      .select(keys.map(col) :+ expr("shiftleft(w, shift)").as("lb") :+
        col("cnt"): _*)
      .withColumn("cum", sum("cnt").over(byKey.orderBy("lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(byKey))
    def pick(k: Int, name: String) =
      min(when(col("cum") >= greatest(lit(1L), expr(s"($k * n + 99) div 100")),
        col("lb"))).as(name)
    g.groupBy(keys.map(col): _*).agg(max("n").as("n"),
      pick(50, "p50_c"), pick(95, "p95_c"), pick(99, "p99_c"))
  }

  /** DAILY quantiles — the grid keyed by (event_type, epoch-day): per-day
    * p50/p95/p99 from per-day bounded state, the hll_daily posture for
    * rank questions (daily latency/size quantiles are the observability
    * figure this exists for). */
  def hdrDaily(events: DataFrame): DataFrame =
    hdrQuantilesKeyed(
      hdrGridKeyed(events.withColumn("day",
        unix_date(to_date(col("ts"))).cast("long")), Seq("event_type", "day")),
      Seq("event_type", "day"))

  /** Rolling `days`-day quantiles from the DAILY grids — the hll_rolling
    * posture: each day's (bounded) grid rows explode to the ≤`days`
    * trailing anchors they serve and SUM-merge per anchor (count addition
    * is the sketch union), then the quantile folds per anchor. The
    * shuffle is calendar×grid-sized, never event-sized — the reason a
    * deployment keeps daily grid rows. Dense over the observed span;
    * gap anchors zero-fill (n = 0, quantiles 0). */
  def hdrRolling(events: DataFrame, days: Int = 7): DataFrame = {
    val grid = hdrGridKeyed(events.withColumn("day",
      unix_date(to_date(col("ts"))).cast("long")), Seq("day"))
    val span = grid.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val merged = grid
      .select(col("shift"), col("w"), col("cnt"),
        explode(sequence(col("day"), col("day") + (days - 1))).as("d"))
      .groupBy("d", "shift", "w").agg(sum("cnt").as("cnt"))
    hdrQuantilesKeyed(merged, Seq("d"))
      .join(span, Seq("d"), "right")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("p50_c"), lit(0L)).as("p50_c"),
        coalesce(col("p95_c"), lit(0L)).as("p95_c"),
        coalesce(col("p99_c"), lit(0L)).as("p99_c"))
  }

  def hdrReport(events: DataFrame): DataFrame =
    hdrQuantilesFrom(hdrGrid(events))

  /** The ann_recall/sketch_error_gate pattern for quantiles: per
    * event_type, the EXACT discrete p95 (Bands rank rule over the raw
    * values) beside the sketch's estimate and the relative error — which
    * the bucket law bounds by 2^-s, spec-floored and driver-checked. The
    * exact side pays the per-group rank window the sketch exists to avoid;
    * it stays in the suite as the honesty gate. */
  def hdrErrorGate(events: DataFrame): DataFrame = {
    val grp = Window.partitionBy("event_type")
    // the exact side shares the sketch's NULL contract (absent measures
    // contribute nothing) — unfiltered, a NULL row would inflate n and
    // sort first, skewing the rank target (review finding, r19)
    val exact = events.select(col("event_type"), centsCol.as("c"))
      .filter(col("c").isNotNull)
      .withColumn("rn", row_number().over(grp.orderBy("c")))
      .withColumn("n", count(lit(1)).over(grp))
      .groupBy("event_type")
      .agg(max(when(col("rn") ===
          greatest(lit(1L), expr("(95 * n + 99) div 100")), col("c")))
        .as("p95_exact"))
    exact.join(hdrReport(events).select(col("event_type"),
        col("p95_c").as("p95_sketch")), Seq("event_type"))
      .select(col("event_type"), col("p95_exact"), col("p95_sketch"),
        round((col("p95_exact") - col("p95_sketch")) / col("p95_exact"), 6)
          .as("rel_err"))
  }

  // NOTE: the oracle CTEs mirror the builders' NULL contract explicitly
  // (WHERE value IS NOT NULL — absent measures contribute nothing); the
  // NEGATIVE-value guard has no DuckDB mirror because the oracle runs only
  // on the legal non-negative domain — Spark raises, the oracle never
  // sees one (the raise_error union-conflict precedent).
  private val HdrGridSql: String =
    s"""e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
       |    FROM events WHERE value IS NOT NULL),
       |  b AS (SELECT event_type,
       |    greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS shift,
       |    c >> greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS w
       |    FROM e),
       |  g AS (SELECT event_type, shift, w, count(*) AS cnt
       |    FROM b GROUP BY 1, 2, 3),
       |  q AS (SELECT event_type, (w << shift) AS lb, cnt,
       |    sum(cnt) OVER (PARTITION BY event_type ORDER BY (w << shift)
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM g),
       |  r AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    min(CASE WHEN cum >= greatest(1, (50*n+99)//100) THEN lb END) AS p50_c,
       |    min(CASE WHEN cum >= greatest(1, (95*n+99)//100) THEN lb END) AS p95_c,
       |    min(CASE WHEN cum >= greatest(1, (99*n+99)//100) THEN lb END) AS p99_c
       |    FROM q GROUP BY event_type)""".stripMargin

  def hdrOracleSql: String =
    s"""WITH $HdrGridSql
       |SELECT event_type, n, p50_c, p95_c, p99_c FROM r""".stripMargin
      .replaceAll("\\s+", " ")

  def hdrDailyOracleSql: String =
    s"""WITH e AS (SELECT event_type,
       |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |    CAST(round(value * 100) AS BIGINT) AS c FROM events
       |    WHERE value IS NOT NULL),
       |  b AS (SELECT event_type, day,
       |    greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS shift,
       |    c >> greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS w
       |    FROM e),
       |  g AS (SELECT event_type, day, shift, w, count(*) AS cnt
       |    FROM b GROUP BY 1, 2, 3, 4),
       |  q AS (SELECT event_type, day, (w << shift) AS lb, cnt,
       |    sum(cnt) OVER (PARTITION BY event_type, day
       |      ORDER BY (w << shift) ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY event_type, day) AS n FROM g)
       |SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
       |  min(CASE WHEN cum >= greatest(1, (50*n+99)//100) THEN lb END) AS p50_c,
       |  min(CASE WHEN cum >= greatest(1, (95*n+99)//100) THEN lb END) AS p95_c,
       |  min(CASE WHEN cum >= greatest(1, (99*n+99)//100) THEN lb END) AS p99_c
       |FROM q GROUP BY event_type, day""".stripMargin
      .replaceAll("\\s+", " ")

  def hdrRollingOracleSql(days: Int = 7): String =
    s"""WITH e AS (SELECT
       |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |    CAST(round(value * 100) AS BIGINT) AS c FROM events
       |    WHERE value IS NOT NULL),
       |  b AS (SELECT day,
       |    greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS shift,
       |    c >> greatest(length(bin(c)) - ${HdrSubBits + 1}, 0) AS w
       |    FROM e),
       |  g AS (SELECT day, shift, w, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
       |  x AS (SELECT u.d, shift, w, CAST(sum(cnt) AS BIGINT) AS cnt
       |    FROM g, unnest(generate_series(day, day + ${days - 1})) AS u(d)
       |    GROUP BY 1, 2, 3),
       |  q AS (SELECT d, (w << shift) AS lb, cnt,
       |    sum(cnt) OVER (PARTITION BY d ORDER BY (w << shift)
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(cnt) OVER (PARTITION BY d) AS n FROM x),
       |  r AS (SELECT d, CAST(max(n) AS BIGINT) AS n,
       |    min(CASE WHEN cum >= greatest(1, (50*n+99)//100) THEN lb END) AS p50_c,
       |    min(CASE WHEN cum >= greatest(1, (95*n+99)//100) THEN lb END) AS p95_c,
       |    min(CASE WHEN cum >= greatest(1, (99*n+99)//100) THEN lb END) AS p99_c
       |    FROM q GROUP BY d),
       |  grid AS (SELECT unnest(generate_series(lo, hi)) AS d
       |    FROM (SELECT min(day) AS lo, max(day) AS hi FROM g))
       |SELECT grid.d AS d, coalesce(n, 0) AS n,
       |  coalesce(p50_c, 0) AS p50_c, coalesce(p95_c, 0) AS p95_c,
       |  coalesce(p99_c, 0) AS p99_c
       |FROM grid LEFT JOIN r ON grid.d = r.d""".stripMargin
      .replaceAll("\\s+", " ")

  def hdrErrorGateOracleSql: String =
    s"""WITH $HdrGridSql,
       |  rk AS (SELECT event_type, c,
       |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS nn FROM e),
       |  ex AS (SELECT event_type,
       |    max(CASE WHEN rn = greatest(1, (95*nn+99)//100) THEN c END)
       |      AS p95_exact
       |    FROM rk GROUP BY event_type)
       |SELECT ex.event_type AS event_type, p95_exact, p95_c AS p95_sketch,
       |  round((p95_exact - p95_c) * 1.0 / p95_exact, 6) AS rel_err
       |FROM ex JOIN r ON ex.event_type = r.event_type""".stripMargin
      .replaceAll("\\s+", " ")
}
