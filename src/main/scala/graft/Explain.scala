package graft

/** Plan audit: prints the formatted physical plan of selected SparkEntry
  * queries so scan pruning / pushdown / join strategies can be inspected
  * (usage: Explain [sfDir] [name...]; default audits the scale-critical set).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s1_keyword_leaf", "s3_prefix_scan", "ql_and_order_topk",
        "t1_topk", "emb_topk_lsh", "emb_topk_ivf", "dedup_minhash",
        "dedup_ngram", "correlate_full", "q3_top_orders",
        "bm25_stored", "rrf_stored", "decontaminate_bloom",
        "emb_topk_filtered_batch", "rrf_stored_filtered_batch",
        "ann_masked_serve", "emb_topk_adaptive", "rrf_stored_masked",
        "dsir_stored", "quality_stored", "sample_pareto", "pipeline_curate",
        "mixture_token_budget", "sample_domain_cap",
        "sketch_kmv", "sketch_kmv_setops", "sketch_hll_stored",
        "sketch_cms", "ppl_kn_mod", "pipeline_release",
        "chunk_cdc", "dedup_cdc")
    val spark = GraftSession.local()
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
