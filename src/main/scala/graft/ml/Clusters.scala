package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over the verified
  * near-dup pair graph, labeling every clustered document with the minimum
  * doc_id of its component — the canonical survivor a dedup pass keeps.
  * Pairwise near-dup output alone under-deletes: if A~B and B~C, the three
  * docs are one duplicate cluster even though A~C never paired, so the keep
  * set must come from components, not edges.
  *
  * Algorithm: iterative min-label propagation — each round every node adopts
  * the smallest label among itself and its neighbors, converging in
  * O(component diameter) rounds. Each round is two hash-partitioned shuffles
  * on doc_id (join + groupBy), i.e. the hash-join formulation of MapReduce
  * connected components; no component is ever collected to the driver, so
  * the shape survives a 100 TB near-dup graph. Near-dup components are
  * shallow (duplicate clusters are dense), so rounds stay small in practice.
  * `localCheckpoint` truncates the per-round lineage — without it the plan
  * doubles every iteration (the iterative-plan trap).
  */
object Clusters {

  /** Connected components of the undirected pair graph.
    * Input: (doc_a, doc_b, ...) candidate pairs. Output: (doc_id,
    * cluster_id) for every doc appearing in a pair, cluster_id = component
    * minimum. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // symmetric edge set, cached: every iteration re-reads it, and the
    // upstream pair pipeline (MinHash LSH + verify) must run exactly once
    val edges = graft.util.Caches.track(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct().cache())
    // seed with min(self, direct neighbors) — one aggregation over the edge
    // set (same shuffle cost as the plain distinct it replaces) that already
    // IS the fixpoint for clique-shaped components, which near-dup clusters
    // overwhelmingly are: the loop then just verifies convergence in one
    // round instead of propagating + verifying in two
    var labels = edges.groupBy("src").agg(min("dst").as("m"))
      .select(col("src").as("doc_id"), least(col("src"), col("m")).as("label"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // smallest neighbor label per node; the symmetric edge set makes this
      // total over the node set, so an inner join loses nothing
      val nbr = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy(col("dst").as("doc_id")).agg(min("label").as("nbr"))
      // The convergence check rides the SAME job as the round's checkpoint
      // materialization: moved-row counting is an accumulator side effect
      // of the checkpoint's one pass, not a second count() action
      // (VERDICT r13 #2: two driver-scheduled waves per round amplified
      // 5-20× under load). Accumulator over-count on task retry is safe
      // here — the loop only asks moved==0 vs >0, and a retried task can
      // only re-add counts for genuinely moved rows.
      val acc = spark.sparkContext.longAccumulator("graft.cc.moved")
      val next = labels.join(nbr, Seq("doc_id"))
        .select(col("doc_id").cast("long"),
          least(col("label"), col("nbr")).cast("long").as("label"),
          (col("nbr") < col("label")).as("moved"))
        .as[(Long, Long, Boolean)]
        .map { case (id, label, moved) =>
          if (moved) acc.add(1L)
          (id, label)
        }
        .toDF("doc_id", "label")
        .localCheckpoint()
      changed = acc.value
      labels = next
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** dedup_clusters over `documents`: MinHash near-dup pairs → components. */
  def dedupClusters(docs: DataFrame, minJaccard: Double): DataFrame =
    connectedComponents(NearDup.nearDuplicates(docs, minJaccard))

  /** The full near-dup REMOVAL pass against a PREBUILT cluster table
    * (Catalog.dupClusters — the stored-index shape): drop every clustered
    * doc except its component's canonical minimum. ONE hash-partitioned
    * anti-join over the corpus, touching only doc_ids (cluster table
    * output, not text) — the MinHash pipeline and the label loop ran once
    * at store build, not per statement (VERDICT r13 #1). Returns the
    * surviving doc_id set. */
  def removalFrom(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")
      .select("doc_id")

  /** removalFrom over an ad-hoc corpus: pairs → components → anti-join,
    * all inline (no stored table — the spec/one-off shape). */
  def removeNearDups(docs: DataFrame, minJaccard: Double): DataFrame =
    removalFrom(docs, dedupClusters(docs, minJaccard))

  /** Keep-BEST near-dup removal: like removeNearDups, but each cluster's
    * survivor is its highest-QUALITY member (TextAnalysis composite score;
    * ties → lowest doc_id) instead of its minimum doc_id — the selection
    * real cleaning pipelines run, where a near-dup cluster mixes clean and
    * boilerplate-damaged copies of the same content and the kept copy
    * should be the best one, not the accident of id order. Same scale
    * shape as removeNearDups plus ONE extra hash aggregation on
    * cluster_id (argmax via max(struct(quality, −doc_id))); the loser set
    * resolves through joins that touch only (doc_id, cluster_id, quality),
    * never text, and the final anti-join is unchanged. Returns the
    * surviving doc_id set. */
  def removeNearDupsKeepBest(docs: DataFrame, minJaccard: Double): DataFrame =
    keepBestFrom(docs, graft.util.Caches.track(
      dedupClusters(docs, minJaccard).cache()))

  /** removeNearDupsKeepBest against a PREBUILT cluster table
    * (Catalog.dupClusters): one quality aggregation (argmax via
    * max(struct(quality, −doc_id))) + one anti-join — the cluster graph
    * work happened at store build. The joins touch only (doc_id,
    * cluster_id, quality); text is read once for the quality scores of
    * CLUSTERED docs only. */
  def keepBestFrom(docs: DataFrame, clusters: DataFrame): DataFrame =
    keepBestScoredFrom(docs, clusters,
      TextAnalysis.quality(docs).select(col("doc_id"), col("quality")),
      "quality")

  /** The GENERIC keep-best tail over an arbitrary (doc_id, score) frame —
    * shared by the text tier (TextAnalysis composite quality) and the
    * image tier (Multimodal sharpness, r19): per-cluster argmax via
    * max(struct(score, −doc_id)) (ties → lowest doc_id — one hash
    * aggregation on cluster_id), losers resolve through joins that touch
    * only (doc_id, cluster_id, score), and the survivors are one
    * anti-join over the universe. Returns the surviving doc_id set. */
  def keepBestScoredFrom(universe: DataFrame, clusters: DataFrame,
      scores: DataFrame, scoreCol: String): DataFrame = {
    val best = clusters
      .join(scores.select(col("doc_id"), col(scoreCol).as("s")),
        Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(max(struct(col("s"), (-col("doc_id")).as("neg"))).as("m"))
      .select(col("cluster_id"), (-col("m.neg")).as("keep_id"))
    val losers = clusters.join(best, Seq("cluster_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")
    universe.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
  }

  /** DuckDB mirror of removeNearDupsKeepBest: the component closure
    * (oracleSql) joined to the shared quality rendering
    * (TextAnalysis.qualitySqlExpr); the per-cluster winner via row_number
    * (quality DESC, doc_id ASC) — the same argmax tie-break as
    * max(struct(quality, −doc_id)). */
  def keepBestOracleSql(minJaccard: Double): String =
    s"""SELECT doc_id FROM documents WHERE doc_id NOT IN (
       |  SELECT doc_id FROM (
       |    SELECT c.doc_id AS doc_id,
       |      row_number() OVER (PARTITION BY c.cluster_id
       |        ORDER BY q.quality DESC, c.doc_id ASC) AS rk
       |    FROM (${oracleSql(minJaccard)}) c
       |    JOIN (SELECT doc_id, ${TextAnalysis.qualitySqlExpr} AS quality
       |          FROM documents) q ON q.doc_id = c.doc_id)
       |  WHERE rk > 1)""".stripMargin.replaceAll("\\s+", " ")

  def removalOracleSql(minJaccard: Double): String =
    // composes oracleSql verbatim as a subquery so the closure semantics
    // have exactly one definition to fix
    s"""SELECT doc_id FROM documents WHERE doc_id NOT IN (
       |  SELECT doc_id FROM (${oracleSql(minJaccard)})
       |  WHERE doc_id <> cluster_id)""".stripMargin.replaceAll("\\s+", " ")

  /** The ONE closure rendering over a pair CTE named `dup` — symmetric
    * edge set + recursive reachability — shared by every cluster-family
    * oracle (text MinHash here, image phash in Multimodal) so the closure
    * semantics have exactly one definition to fix. */
  private[ml] val ClosureCtesSql: String =
    """edges AS (SELECT doc_a AS a, doc_b AS b FROM dup
      |          UNION SELECT doc_b, doc_a FROM dup),
      |reach AS (SELECT a, b FROM edges
      |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)"""
      .stripMargin

  /** The ONE component-label rendering over `reach`: cluster_id =
    * component minimum. */
  private[ml] val ComponentMinSql: String =
    "SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a"

  /** DuckDB mirror: transitive closure by recursive CTE over the same
    * verified pair set (NearDup.pairCtesSql), then component-min per node.
    * The closure is quadratic per component — fine for an oracle at sf0.01,
    * exactly what the Spark side must NOT do at scale. */
  def oracleSql(minJaccard: Double): String =
    (s"WITH RECURSIVE ${NearDup.pairCtesSql(minJaccard)}, " +
      s"$ClosureCtesSql $ComponentMinSql").replaceAll("\\s+", " ")
}
