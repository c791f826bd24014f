package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) of the embedding corpus — the far end of the
  * scalar-quantization family Quant opens (SQ8's own scaladoc names it):
  * each vector splits into `M` disjoint subspaces and stores ONE BYTE per
  * subspace — the index of its nearest codebook centroid — so a
  * 64-dim float32 row shrinks 256 B → 8 B (32×, vs SQ8's 4×). Ranking is
  * asymmetric ADC (asymmetric distance computation): the raw query against
  * the candidate's reconstructed centroids, where every reconstructed
  * float comes from the committed codebook CONSTANTS — candidates
  * themselves contribute only their M code bytes (expressions.PqSim, the
  * codegen'd kernel).
  *
  * Like SQ8, PQ composes with the IVF coarse quantizer
  * (Catalog.pqIvfStore: codes hive-partitioned by cell); a lookup probes
  * its nearest cells and ranks only those partitions' codes — O(probed
  * cells) serving over a store 32× smaller than the floats. Codebooks are
  * trained offline on a corpus sample (TrainPq → TrainedPqCodebooks, the
  * TrainedCentroids pattern), so both engines embed the same literal
  * matrices and the DuckDB oracle can mirror encode + rank exactly.
  *
  * Quality sits below SQ8 (16 centroids replace a whole 8-dim subspace —
  * quantization error is per-REGION, not per-component); PqSpec measures
  * the probed-cell overlap against IVF-flat and pins a floor. The
  * reference engine stores float scores only; this is
  * pipeline-beyond-reference surface like the rest of ml/.
  */
object Pq {

  val M = 8                    // subspaces per vector
  val Ksub = 16                // centroids per subspace codebook
  val SubDim = Ann.Dims / M    // dimensions per subspace
  // fail loudly if the committed codebooks' shape ever drifts from the
  // geometry the encode/rank expressions are generated with (TrainPq
  // writes M×Ksub×SubDim; a partial regeneration would otherwise
  // mis-index silently)
  require(TrainedPqCodebooks.books.length == M &&
    TrainedPqCodebooks.books.forall(b =>
      b.length == Ksub && b.forall(_.length == SubDim)),
    s"TrainedPqCodebooks shape != ${M}x${Ksub}x$SubDim")

  /** Squared distance from the j-th subspace of `emb` to codebook centroid
    * (j, k) — unrolled left-to-right over the SubDim components, the same
    * IEEE sequence as the oracle's unrolled SQL, so the argmins agree.
    * Parameterized over the codebook set so the RESIDUAL tier
    * (PqResidual) encodes through the identical expression shape. */
  private[ml] def distExprWith(emb: Column, j: Int, k: Int,
      books: Seq[Seq[Seq[Double]]]): Column = {
    val c = books(j)(k)
    (0 until SubDim).map { d =>
      val x = element_at(emb, j * SubDim + d + 1)
      (x - lit(c(d))) * (x - lit(c(d)))
    }.reduceLeft(_ + _)
  }

  private def distExpr(emb: Column, j: Int, k: Int): Column =
    distExprWith(emb, j, k, TrainedPqCodebooks.books)

  /** The M-byte code row for a double-array embedding column: each byte
    * is the 0-based index of the subspace's nearest centroid (ties →
    * lowest index, via first-occurrence array_position on the same
    * computed distances both engines share). A pure per-row expression —
    * the batch store build and the streamed upkeep share it verbatim
    * (there is no quantizer to freeze: the codebooks ARE committed
    * constants). */
  private[graft] def codesExprWith(emb: Column,
      books: Seq[Seq[Seq[Double]]]): Column =
    array((0 until M).map { j =>
      val dists = array((0 until Ksub).map(k =>
        distExprWith(emb, j, k, books)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("byte")
    }: _*)

  private[graft] def codesExpr(emb: Column): Column =
    codesExprWith(emb, TrainedPqCodebooks.books)

  /** (vec_id, codes array<tinyint> of length M) — the PERSISTABLE store
    * content (Catalog.pqIvfStore lays it out under the coarse quantizer). */
  def pqCodes(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), codesExpr(col("emb")).as("codes"))

  /** The ADC ranking sim (expressions.PqSim kernel), rounded like every
    * other similarity the engine serves. */
  private def pqSim(codes: Column, qemb: Column, qn: Column): Column =
    round(call_function("graft_pq_sim", codes, qemb, qn), 6)

  /** Top-k by asymmetric PQ cosine against the COMPOSED PQ×IVF store
    * (Catalog.pqIvfStore) — the sq8IvfTopKFrom shape over the 32×-smaller
    * codes: probe the query's nearest cells (bounded collect → static
    * partition pruning), rank the probed rows through the PqSim kernel.
    * Returns (vec_id, sim). */
  def pqIvfTopKFrom(store: DataFrame, emb: DataFrame, qVecId: Long,
      k: Int): DataFrame =
    pqIvfTopKFromVec(store, Ann.queryVec(emb, qVecId), qVecId, k)

  /** PQ×IVF lookup restricted to an ALLOWED id set — filtered serving at
    * the 32×-compressed tier (Quant.sq8IvfTopKAllowed's twin; the
    * semi-join commutes with the probed-cell filters, one scoring
    * chain). */
  def pqIvfTopKAllowed(store: DataFrame, emb: DataFrame, qVecId: Long,
      allowed: DataFrame, k: Int): DataFrame =
    pqIvfTopKFrom(store.join(allowed.select("vec_id"), Seq("vec_id"),
      "left_semi"), emb, qVecId, k)

  /** PQ×IVF lookup under a TOMBSTONE mask — the delete lifecycle's masked
    * serve at the product-quantized tier. */
  def pqIvfTopKMasked(store: DataFrame, emb: DataFrame, qVecId: Long,
      tombstones: DataFrame, k: Int): DataFrame =
    pqIvfTopKFrom(store.join(tombstones.select("vec_id"), Seq("vec_id"),
      "left_anti"), emb, qVecId, k)

  private[ml] def pqIvfTopKFromVec(store: DataFrame, vec: Array[Double],
      qVecId: Long, k: Int): DataFrame =
    store.filter(col("cell").isin(Ann.probedCellsOf(vec): _*))
      .filter(col("vec_id") =!= qVecId)
      .select(col("vec_id"),
        pqSim(col("codes"), Ann.litVec(vec),
          lit(Ann.selfDot(vec))).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)

  /** BATCHED PQ serving — the sq8IvfTopKBatchFrom shape: shared probe
    * stage (Ann.probeBatch), broadcast probed-cell semi-join for dynamic
    * partition pruning, candidates ranked through the PqSim kernel,
    * per-query top-k riding the rank pushdown. Same query-table contract
    * as the other batch lookups. Returns (qid, vec_id, sim). */
  def pqIvfTopKBatchFrom(store: DataFrame, emb: DataFrame,
      queries: DataFrame, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qemb"))
    val probed = Ann.probeBatch(q, Ann.centroids(emb))
    val joined = probed.join(Ann.prunedByProbedCells(store, probed),
      Seq("cell"))
    val cand = if (excludeSelf) joined.filter(col("vec_id") =!= col("qid"))
               else joined
    Ann.topKPerQuery(cand
      .select(col("qid"), col("vec_id"),
        pqSim(col("codes"), col("qemb"), col("qn")).as("sim")), k)
  }

  /** Recall@k of the PQ×IVF lookup against the exact brute-force top-k in
    * the PLANTED regime — the quantized tier's driver-checked quality gate
    * (VERDICT r13 #7), completing the recall ladder ann_recall_planted
    * pins for LSH/IVF: the planted clones are provably reachable (they
    * concentrate in the query's probed cells), so a codebook / encode /
    * ADC-kernel regression moves this number on BOTH engines instead of
    * only in a spec. The ad-hoc store is built from the planted corpus
    * with the same pqCodes ∘ cellAssignment composition as
    * Catalog.pqIvfStore. Returns (method, hits, recall). */
  def recallAtKPlanted(emb: DataFrame, qVecId: Long, m: Int,
      k: Int): DataFrame = {
    val e = graft.util.Caches.track(
      Ann.plantedCluster(emb, qVecId, m).cache())
    // cached: the 128-centroid encode expression over the planted corpus is
    // the dominant cost — repeated statement evaluations (bench reps) must
    // reuse the encoded codes, as the materialized store would
    val store = graft.util.Caches.track(pqCodes(e)
      .join(Ann.cellAssignment(e).select(col("vec_id"), col("cell")),
        Seq("vec_id"))
      .cache())
    val ee = e.select(col("vec_id"), col("embedding").as("emb"))
    Ann.recallOf(Ann.exactTopKIds(ee, qVecId, k),
      pqIvfTopKFrom(store, e, qVecId, k), "pq", k)
  }

  /** The planted PQ gate served from STORED fixtures (VERDICT r14 #5):
    * planted corpus, composed PQ×IVF store, and the k-row exact baseline
    * all materialized once per sf-dir (Catalog.plantedEmb / plantedPqIvf /
    * plantedExactTop10) — the 128-centroid encode never re-runs inside the
    * statement. */
  def recallAtKFrom(store: DataFrame, emb: DataFrame, exact: DataFrame,
      qVecId: Long, k: Int): DataFrame = {
    val ids = exact.select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = pqIvfTopKFrom(store, emb, qVecId, k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    Ann.recallRows(emb.sparkSession, ids, Seq("pq" -> pq), k)
  }

  /** The multi-stage retrieval LADDER: a cheap PQ shortlist (kCoarse
    * candidates ranked on code bytes alone) re-ranked EXACTLY against the
    * float embeddings — the standard deployment shape for coarse
    * quantizers (SCALE.md): the 32× store screens, the float tier
    * decides. The shortlist ids are collected eagerly — a BOUNDED list of
    * exactly kCoarse longs, the same bounded-collect class as the probe
    * lists — and pushed into the embeddings scan as a static In filter,
    * so the exact tier READS only the kCoarse survivors' float rows
    * (file/row-group skipping at planning time), never the corpus.
    * Returns (vec_id, sim) — exact cosines. */
  def pqRerank(store: DataFrame, emb: DataFrame, qVecId: Long,
      kCoarse: Int, k: Int): DataFrame = {
    val shortlist = pqIvfTopKFrom(store, emb, qVecId, kCoarse)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val q = broadcast(e.filter(col("vec_id") === qVecId)
      .select(col("emb").as("qemb")))
    e.filter(col("vec_id").isin(shortlist: _*)).crossJoin(q)
      .select(col("vec_id"),
        round(Ann.cosine(col("emb"), col("qemb")), 6).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  // ---- DuckDB mirrors ----

  private[ml] def cbListSqlWith(j: Int,
      books: Seq[Seq[Seq[Double]]]): String =
    books(j).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  private def cbListSql(j: Int): String =
    cbListSqlWith(j, TrainedPqCodebooks.books)

  /** The (j, k) squared distance, unrolled in the same left-to-right
    * component order as distExpr. Parameterized over codebooks and the
    * source array's SQL rendering (the residual tier's is an expression,
    * not a column name). */
  private[ml] def distSqlWith(j: Int, k: Int, books: Seq[Seq[Seq[Double]]],
      src: String): String = {
    val c = books(j)(k)
    (0 until SubDim).map { d =>
      val x = s"$src[${j * SubDim + d + 1}]"
      s"($x - ${c(d)}) * ($x - ${c(d)})"
    }.mkString(" + ")
  }

  private def distSql(j: Int, k: Int): String =
    distSqlWith(j, k, TrainedPqCodebooks.books, "emb")

  /** The argmin code list over arbitrary codebooks/source (shared with the
    * residual tier so the encode mirroring has ONE rendering). */
  private[ml] def codesListSqlWith(books: Seq[Seq[Seq[Double]]],
      src: String): String =
    (0 until M).map { j =>
      val dists = (0 until Ksub).map(k => s"(${distSqlWith(j, k, books, src)})")
        .mkString("[", ",", "]")
      s"(list_position($dists, list_min($dists)) - 1)"
    }.mkString("[", ",", "]")

  /** The reconstructed vector: per subspace, the first-minimum centroid
    * (list_position ≡ Spark's array_position on identically computed
    * distances), flattened in subspace order — so list_dot_product over it
    * accumulates the exact dimension-ordered IEEE sequence the PqSim
    * kernel produces. Parameterized like the encode renderings. */
  private[ml] def xqSqlWith(books: Seq[Seq[Seq[Double]]],
      src: String): String = {
    val subs = (0 until M).map { j =>
      val dists = (0 until Ksub).map(k => s"(${distSqlWith(j, k, books, src)})")
        .mkString("[", ",", "]")
      s"(${cbListSqlWith(j, books)})[list_position($dists, list_min($dists))]"
    }
    s"flatten([${subs.mkString(",")}])"
  }

  private def xqSql: String = xqSqlWith(TrainedPqCodebooks.books, "emb")

  /** The reconstructed-corpus CTE `pxq` both PQ oracles share. */
  private def pxqCteSql: String =
    s"pxq AS (SELECT vec_id, $xqSql AS xq FROM e)"

  /** The ONE SQL rendering of the M-code list (argmin per subspace, tie →
    * first occurrence) — shared by every PQ store-content oracle so the
    * encode mirroring cannot drift between them. */
  private def codesListSql: String =
    codesListSqlWith(TrainedPqCodebooks.books, "emb")

  /** DuckDB mirror of pqCodes (the store's content, exploded to scalar
    * (vec_id, pos, code) so codes pin element-wise). */
  def codesOracleSql: String =
    s"""WITH e AS (${Ann.BaseSrcSql}),
       |cx AS (SELECT vec_id, $codesListSql AS codes FROM e)
       |SELECT vec_id, CAST(u.pos AS INT) AS pos, CAST(u.code AS TINYINT) AS code
       |FROM (SELECT vec_id,
       |  unnest(list_transform(range(1, $M + 1),
       |    i -> {'pos': i - 1, 'code': codes[i]})) AS u FROM cx)
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of the STREAMED composed-store upkeep
    * (EmbeddingsIngest.pqRows): the shared coarse-quantizer CTE chain and
    * the same argmin codes, exploded to scalar (vec_id, cell, pos, code)
    * so the stored/streamed/compacted content pins element-wise — the
    * sq8StreamOracleSql shape for the PQ family. */
  def pqStreamOracleSql: String =
    s"""WITH ${Ann.cellCtesSql(Ann.BaseSrcSql)},
       |cx AS (SELECT vec_id, $codesListSql AS codes FROM e)
       |SELECT ux.vec_id AS vec_id, CAST(cell.cell AS BIGINT) AS cell,
       |  CAST(u.pos AS INT) AS pos, CAST(u.code AS TINYINT) AS code
       |FROM (SELECT vec_id,
       |  unnest(list_transform(range(1, $M + 1),
       |    i -> {'pos': i - 1, 'code': codes[i]})) AS u FROM cx) AS ux
       |JOIN cell ON cell.vec_id = ux.vec_id
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of pqRerank: the single-query PQ oracle's ranking as a
    * kCoarse-deep shortlist CTE, then the exact float cosine over ONLY the
    * shortlist — ivfOracleSql's ranking expression, so the re-rank tier
    * and the IVF-flat oracle cannot drift. */
  def pqRerankOracleSql(qVecId: Long, kCoarse: Int, k: Int): String =
    s"""WITH ${Ann.cellCtesSql(Ann.BaseSrcSql)},
       |$pxqCteSql,
       |qc AS (SELECT cent_id AS cell FROM asg WHERE vec_id = $qVecId
       |       ORDER BY csim DESC, cent_id ASC LIMIT ${Ann.Probes}),
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = $qVecId),
       |short AS (SELECT pxq.vec_id AS vec_id,
       |    round(list_dot_product(pxq.xq, q.qemb) /
       |      sqrt(list_dot_product(pxq.xq, pxq.xq) * list_dot_product(q.qemb, q.qemb)), 6) AS psim
       |  FROM pxq JOIN cell USING (vec_id) JOIN qc USING (cell), q
       |  WHERE pxq.vec_id <> $qVecId
       |  ORDER BY psim DESC, vec_id LIMIT $kCoarse)
       |SELECT s.vec_id AS vec_id,
       |  round(list_dot_product(e.emb, q.qemb) /
       |    sqrt(list_dot_product(e.emb, e.emb) * list_dot_product(q.qemb, q.qemb)), 6) AS sim
       |FROM short s JOIN e ON e.vec_id = s.vec_id, q
       |ORDER BY sim DESC, vec_id LIMIT $k
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of pqIvfTopKFrom ∘ pqIvfStore (srcSql parameterized so
    * the planted-regime recall gate reuses the exact same rendering). */
  def pqIvfOracleSql(qVecId: Long, k: Int,
      srcSql: String = Ann.BaseSrcSql): String =
    s"""WITH ${Ann.cellCtesSql(srcSql)},
       |$pxqCteSql,
       |qc AS (SELECT cent_id AS cell FROM asg WHERE vec_id = $qVecId
       |       ORDER BY csim DESC, cent_id ASC LIMIT ${Ann.Probes}),
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = $qVecId)
       |SELECT pxq.vec_id AS vec_id,
       |  round(list_dot_product(pxq.xq, q.qemb) /
       |    sqrt(list_dot_product(pxq.xq, pxq.xq) * list_dot_product(q.qemb, q.qemb)), 6) AS sim
       |FROM pxq JOIN cell USING (vec_id) JOIN qc USING (cell), q
       |WHERE pxq.vec_id <> $qVecId
       |ORDER BY sim DESC, vec_id LIMIT $k
       |""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of pqIvfTopKAllowed / pqIvfTopKMasked: pqIvfOracleSql's
    * chain with the caller-supplied id subquery semi- (allowed) or
    * anti-joined (masked) on the candidate side. */
  def pqIvfRestrictedOracleSql(qVecId: Long, k: Int, idsSql: String,
      masked: Boolean): String = {
    val (cte, pred) =
      if (masked) ("dead", "AND pxq.vec_id NOT IN (SELECT vec_id FROM dead)")
      else ("al", "AND pxq.vec_id IN (SELECT vec_id FROM al)")
    s"""WITH ${Ann.cellCtesSql(Ann.BaseSrcSql)},
       |$pxqCteSql,
       |qc AS (SELECT cent_id AS cell FROM asg WHERE vec_id = $qVecId
       |       ORDER BY csim DESC, cent_id ASC LIMIT ${Ann.Probes}),
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = $qVecId),
       |$cte AS ($idsSql)
       |SELECT pxq.vec_id AS vec_id,
       |  round(list_dot_product(pxq.xq, q.qemb) /
       |    sqrt(list_dot_product(pxq.xq, pxq.xq) * list_dot_product(q.qemb, q.qemb)), 6) AS sim
       |FROM pxq JOIN cell USING (vec_id) JOIN qc USING (cell), q
       |WHERE pxq.vec_id <> $qVecId
       |  $pred
       |ORDER BY sim DESC, vec_id LIMIT $k
       |""".stripMargin.replaceAll("\\s+", " ")
  }

  /** DuckDB mirror of recallAtKPlanted: the exact top-k and the PQ lookup
    * oracle composed over the same planted source — the
    * Ann.recallOracleSql shape for the PQ tier. */
  def pqRecallOracleSql(qVecId: Long, k: Int, srcSql: String): String = {
    // the exact tier is Ann's ONE rendering — the PQ gate must compare
    // against the same brute-force baseline as the LSH/IVF gate
    val exact = Ann.exactTopKSql(qVecId, k, srcSql)
    s"""WITH exact AS (($exact)),
       |pqr AS ((${pqIvfOracleSql(qVecId, k, srcSql)}))
       |SELECT 'pq' AS method, count(*) AS hits,
       |  round(count(*) * 1.0 / $k, 4) AS recall
       |FROM pqr WHERE vec_id IN (SELECT vec_id FROM exact)
       |""".stripMargin.replaceAll("\\s+", " ")
  }

  /** DuckDB mirror of pqIvfTopKBatchFrom for the query batch
    * vec_id < maxQid — the shared batch CTEs and rank tail. */
  def pqIvfBatchOracleSql(maxQid: Long, k: Int): String =
    s"""WITH ${Ann.cellCtesSql(Ann.BaseSrcSql)},
       |$pxqCteSql,
       |${Ann.batchQueryCtesSql(maxQid)},
       |cand AS (SELECT p.qid AS qid, pxq.vec_id AS vec_id,
       |    round(list_dot_product(pxq.xq, p.qemb) /
       |      sqrt(list_dot_product(pxq.xq, pxq.xq) * list_dot_product(p.qemb, p.qemb)), 6) AS sim
       |  FROM probed p JOIN cell USING (cell) JOIN pxq ON pxq.vec_id = cell.vec_id
       |  WHERE pxq.vec_id <> p.qid)
       |${Ann.batchRankSql(k)}
       |""".stripMargin.replaceAll("\\s+", " ")
}
