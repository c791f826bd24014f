package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate compares each `SparkEntry.queries` result
  * against its `oracleSql` twin; an entry missing its oracle silently
  * degrades to a weaker rows-only check. This repo's convention is FULL
  * key-for-key alignment (281 at r18) — pin it so a typo'd key or a
  * forgotten oracle fails in `sbt test`, not in the driver's report.
  * (Oracle output TYPES are gated separately: scripts/check.py DESCRIBEs
  * every oracle in DuckDB and fails HUGEINT/DECIMAL outputs — the r17
  * representation-hash postmortem; that needs a DuckDB process, so it
  * lives in the python gate, not here.) */
class EntryAlignmentSpec extends AnyFunSuite {

  test("queries and oracleSql align key-for-key") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("entry count matches the round tally (update deliberately per entry)") {
    // 281 at r18 + r19's cdc_cut, mm_phash_clusters, mm_phash_removal,
    // mm_phash_keep_best, tsv_load_summaries, decontaminate_fuzzy,
    // decontaminate_fuzzy_stored, pipeline_funnel, ngram_novelty,
    // emb_outliers, ts_seasonal, decontaminate_removal, ivf_drift,
    // pipeline_funnel_by_source, text_langid_confusion, dedup_containment,
    // containment_removal; r20's ngram_novelty_stored,
    // contain_pairs_stream, contain_pairs_compact, shingle_stream_index,
    // shingle_stream_df, shingle_compact
    assert(SparkEntry.queries.size == 304,
      s"entry count moved to ${SparkEntry.queries.size} — update this pin " +
        "alongside the contended-bench FAMILY and the counters baseline")
  }
}
