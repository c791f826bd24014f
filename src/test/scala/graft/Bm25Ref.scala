package graft

import graft.ml.Retrieval

/** The ONE in-memory BM25 reference model shared by RetrievalSpec and
  * RetrievalProps — the engine's exact conventions (Lucene non-negative
  * idf, round-4 scores, doc_id tiebreak, docs sharing no query term
  * excluded), so a scoring-convention change cannot leave one suite
  * validating a stale model.
  */
object Bm25Ref {

  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def topK(docs: Seq[(Long, String)], terms: Seq[String],
      k: Int): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    toks.flatMap { case (id, tk) =>
      if (!terms.exists(tk.contains)) None
      else Some(id -> round4(terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1)
        idf * (tf * (Retrieval.K1 + 1)) /
          (tf + (tk.size / avgdl * Retrieval.B + (1 - Retrieval.B)) * Retrieval.K1)
      }.sum))
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }
}
