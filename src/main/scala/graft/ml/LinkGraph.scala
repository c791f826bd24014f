package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link-graph quality signals — the published web-curation verb
  * the per-document filters can't express: CCNet/RefinedWeb-era pipelines
  * rank registrar hosts by link centrality (Common Crawl publishes exactly
  * this as its host-level harmonic-centrality/PageRank ranking) and use the
  * host rank as a document quality prior. Implemented as fixed-iteration
  * PageRank (Page et al. 1999, damping 0.85) over a host graph.
  *
  * Engine-exactness design: ranks are held in FIXED-POINT INTEGER
  * arithmetic (scale 10^12, damping as the exact rational 17/20, every
  * division an integer `div`), so each iteration is a sum of integers —
  * associative and order-independent — and Spark, DuckDB, and a plain-Scala
  * reference produce BIT-IDENTICAL ranks regardless of partitioning or
  * aggregation order. The usual float PageRank would differ in the last
  * ulps per engine purely from summation order; the md5/`conv` convention
  * used for sampling randomness has its integer-exactness twin here.
  *
  * Scale shape: one iteration = one equi-join of the edge list against the
  * current rank vector plus one partial-aggregating groupBy on `dst` — the
  * Pregel/GraphX message-passing shape expressed as DataFrame ops. At
  * 100 TB the host graph is ~10^8 hosts and ~10^9 distinct edges: the edge
  * list partitions by `src` once and every iteration reuses that layout
  * (rank vector exchanges, edges don't move — ranks are the small side).
  * Nothing is collected to the driver; the host count `n` is the one
  * scalar, folded once at store build (the lexStatsFolded posture).
  *
  * The synthetic corpus has no hyperlinks, so the graph is PLANTED
  * deterministically from doc_id arithmetic on BOTH engines (the
  * text_scrub/domain_stats planted-fixture pattern): each document lives
  * on host `doc_id % H` and links to two other hosts at offsets derived
  * from doc_id — offsets lie in 1..H-1 so self-loops are impossible and
  * (docs >> H) every host has out-edges, i.e. no dangling-mass term.
  */
object LinkGraph {

  /** Planted host count; small enough that sf0.001's 500 docs cover every
    * residue class (no dangling hosts), large enough for a non-trivial
    * graph. */
  val Hosts = 24

  /** Fixed-point scale: rank 1.0 ≡ 10^12. 17·Scale < 2^63, so the damping
    * product never overflows a BIGINT on either engine. */
  val Scale = 1000000000000L

  /** Damping factor 0.85 as the exact rational 17/20. */
  val DampNum = 17L
  val DampDen = 20L

  /** Fixed iteration count — the published "a few tens of iterations"
    * truncated to a bench-proportionate 5; the iteration count is part of
    * the operator contract (both engines run exactly this many). */
  val Iterations = 5

  /** The planted host link graph: (src, dst, n_docs) — n_docs counts the
    * documents asserting the link (the edge-weight signal `link_graph`
    * reports); PageRank consumes the DISTINCT edge set. Offsets are
    * `1 + (doc_id·k mod (H−1))` ∈ 1..H−1, so dst ≠ src by construction. */
  def plantedEdges(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), (col("doc_id") % Hosts).as("src"))
    val out = h.select(col("src"),
        ((col("src") + 1 + (col("doc_id") * 7) % (Hosts - 1)) % Hosts).as("dst"))
      .unionAll(h.select(col("src"),
        ((col("src") + 1 + (col("doc_id") * 13) % (Hosts - 1)) % Hosts).as("dst")))
    out.groupBy("src", "dst").agg(count(lit(1)).as("n_docs"))
  }

  /** Shared planted-edge derivation as DuckDB SQL (mirrors plantedEdges). */
  def edgesSql: String =
    s"""SELECT src, dst, count(*) AS n_docs FROM (
       |  SELECT doc_id % $Hosts AS src,
       |    (doc_id % $Hosts + 1 + (doc_id * 7) % ${Hosts - 1}) % $Hosts AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id % $Hosts AS src,
       |    (doc_id % $Hosts + 1 + (doc_id * 13) % ${Hosts - 1}) % $Hosts AS dst
       |  FROM documents) GROUP BY src, dst""".stripMargin

  def linkGraphOracleSql: String =
    s"WITH e AS ($edgesSql) SELECT * FROM e".replaceAll("\\s+", " ")

  /** Fixed-point integer PageRank over the DISTINCT edges of `edges`.
    * `nHosts` is the folded host count (computed once at store build — the
    * one scalar the update rule needs for the teleport term). Returns
    * (host, rank_i) with rank_i ≈ rank · 10^12, bit-identical across
    * engines. Each iteration: message = rank_i div odeg along every edge,
    * fold by dst, then rank' = base + (17·msgs) div 20, with hosts that
    * received no messages kept at the teleport base via a left join. */
  def pageRank(edges: DataFrame, nHosts: Long,
      iterations: Int = Iterations): DataFrame = {
    require(nHosts > 0, "pageRank needs a non-empty host set")
    val e = edges.select("src", "dst").distinct()
    val od = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val eo = e.join(od, "src")
    val hosts = e.select(col("src").as("host"))
      .unionAll(e.select(col("dst").as("host"))).distinct()
    val base = (DampDen - DampNum) * Scale / (DampDen * nHosts)
    var r = hosts.select(col("host"), lit(Scale / nHosts).as("rank_i"))
    for (_ <- 1 to iterations) {
      val m = eo.join(r, eo("src") === r("host"))
        .select(col("dst"), expr("rank_i div odeg").as("c"))
        .groupBy("dst").agg(sum("c").as("m"))
      r = hosts.join(m, hosts("host") === m("dst"), "left")
        .select(col("host"),
          (lit(base) +
            expr(s"($DampNum * coalesce(m, CAST(0 AS BIGINT))) div $DampDen"))
            .as("rank_i"))
    }
    r
  }

  /** The full 5-iteration PageRank as chained DuckDB CTEs over the planted
    * graph — integer `//` division throughout, so the oracle's ranks are
    * bit-identical to the Spark plan's. */
  def pageRankOracleSql(iterations: Int = Iterations): String = {
    val iterCtes = (1 to iterations).map { i =>
      s"""r$i AS (SELECT h.host,
         |  (SELECT base FROM b) + ($DampNum * COALESCE(s.m, 0)) // $DampDen AS rank_i
         |  FROM hosts h LEFT JOIN (
         |    SELECT e.dst, CAST(sum(r.rank_i // od.odeg) AS BIGINT) AS m
         |    FROM e JOIN r${i - 1} r ON r.host = e.src
         |    JOIN od ON od.src = e.src
         |    GROUP BY e.dst) s ON s.dst = h.host)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ew AS ($edgesSql),
       |e AS (SELECT DISTINCT src, dst FROM ew),
       |hosts AS (SELECT DISTINCT src AS host FROM e
       |  UNION SELECT DISTINCT dst FROM e),
       |n AS (SELECT count(*) AS n FROM hosts),
       |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |b AS (SELECT (($DampDen - $DampNum) * $Scale) // ($DampDen * (SELECT n FROM n)) AS base),
       |r0 AS (SELECT host, $Scale // (SELECT n FROM n) AS rank_i FROM hosts),
       |$iterCtes
       |SELECT host, rank_i FROM r$iterations""".stripMargin
      .replaceAll("\\s+", " ")
  }

  /** Per-source host-rank mass — the curation signal the rank store exists
    * for: every document inherits its host's stored rank; aggregating the
    * exact integer ranks per source gives the corpus-card "how much
    * link-authority mass does each source carry" figure. One join of the
    * doc→host projection against the (tiny relative to corpus) rank store
    * plus one partial-aggregating groupBy; the corpus text is never
    * scanned. The join is left UNHINTED: at planted scale AQE broadcasts
    * the 24-row rank store; a real 10^8-host store exceeds any broadcast
    * threshold and degrades to a shuffle equi-join on `host` — the same
    * justified-unhinted posture as the LSH candidate semi-join. */
  def sourceRankMass(docs: DataFrame, ranks: DataFrame): DataFrame =
    docs.select(col("source"), (col("doc_id") % Hosts).as("host"))
      .join(ranks, "host")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("rank_i").as("rank_mass"))

  def sourceRankMassOracleSql(iterations: Int = Iterations): String = {
    val pr = pageRankOracleSql(iterations)
    s"""WITH pr AS ($pr)
       |SELECT source, count(*) AS n_docs, CAST(sum(rank_i) AS BIGINT) AS rank_mass
       |FROM (SELECT source, doc_id % $Hosts AS host FROM documents) d
       |JOIN pr ON pr.host = d.host
       |GROUP BY source""".stripMargin.replaceAll("\\s+", " ")
  }

  /** Plain-Scala reference implementation (exact integer arithmetic) for
    * the spec's engine-equality pin. */
  def referencePageRank(edges: Seq[(Long, Long)],
      iterations: Int = Iterations): Map[Long, Long] = {
    val e = edges.distinct
    val hosts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = hosts.size.toLong
    val odeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (DampDen - DampNum) * Scale / (DampDen * n)
    var r = hosts.map(h => h -> Scale / n).toMap
    for (_ <- 1 to iterations) {
      val msgs = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (s, _) => r(s) / odeg(s) }.sum
      }
      r = hosts.map(h =>
        h -> (base + DampNum * msgs.getOrElse(h, 0L) / DampDen)).toMap
    }
    r
  }
}
