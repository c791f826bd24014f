package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.Compact
import graft.model.Catalog

/** Generation compaction (Compact) — VERDICT r9 #7: the streamed index
  * sinks append small files per micro-batch; compaction must rewrite them
  * into one sorted generation that READS IDENTICALLY (readers are
  * oblivious) while actually shrinking the file count, and the df-delta
  * fold must equal a direct count.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def sketch = graft.ml.NearDup.winnowFingerprints(
    Catalog.documents(spark, dir))

  test("compaction preserves content exactly and shrinks file count") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val raw = s"$base/raw"
    // simulate an always-on appender: 4 micro-batches × 3 task files each
    (0 until 4).foreach { i =>
      sketch.filter(col("doc_id") % 4 === i).repartition(3)
        .write.mode("append").parquet(raw)
    }
    val nPre = Compact.dataFileCount(raw)
    assert(nPre >= 12)
    val pre = spark.read.parquet(raw)
    val post = Compact.compactIndex(spark, raw, s"$base/gen1",
      "fp", Seq("fp", "doc_id"), partitions = Some(4))
    assert(Compact.dataFileCount(s"$base/gen1") < nPre)
    assert(pre.count() == post.count())
    assert(pre.exceptAll(post).count() == 0)
    assert(post.exceptAll(pre).count() == 0)
    Compact.rmTree(base)
  }

  test("atomic generation swap: flip is all-or-nothing for readers, stale gens cleaned") {
    val base = java.nio.file.Files.createTempDirectory("graft_swap").toString
    val raw = s"$base/raw"
    val idx = s"$base/idx"
    val half = sketch.filter(col("doc_id") % 2 === 0)
    half.repartition(3).write.mode("append").parquet(raw)
    // no manifest yet — an index base that never compacted reads loudly
    assert(Compact.currentGeneration(idx).isEmpty)
    intercept[RuntimeException](Compact.readCurrent(spark, idx))
    // cycle 1: compact → flip; readers resolve gen-000001 via the manifest
    val g1 = Compact.compactAndFlip(spark, raw, idx, "fp",
      Seq("fp", "doc_id"), partitions = Some(2))
    assert(Compact.currentGeneration(idx).contains(s"$idx/gen-000001"))
    assert(g1.count() == half.count())
    val openedBeforeFlip = Compact.readCurrent(spark, idx)
    // cycle 2: more data arrives, compact again → gen-000002, flip
    sketch.filter(col("doc_id") % 2 === 1)
      .repartition(3).write.mode("append").parquet(raw)
    val g2 = Compact.compactAndFlip(spark, raw, idx, "fp",
      Seq("fp", "doc_id"), partitions = Some(2))
    assert(Compact.currentGeneration(idx).contains(s"$idx/gen-000002"))
    // a reader opened BEFORE the flip still answers from the old
    // generation (its files are untouched until cleanup) ...
    assert(openedBeforeFlip.count() == half.count())
    // ... while a reader resolving AFTER the flip sees the new one, equal
    // to the full batch sketch
    assert(g2.count() == sketch.count())
    assert(g2.exceptAll(sketch).count() == 0)
    // deferred cleanup drops exactly the unpointed generation
    assert(Compact.cleanupStale(idx) == Seq("gen-000001"))
    assert(Compact.readCurrent(spark, idx).count() == sketch.count())
    Compact.rmTree(base)
  }

  test("a held compaction lock makes a second compactor fail loudly, before writing") {
    val base = java.nio.file.Files.createTempDirectory("graft_lock").toString
    val raw = s"$base/raw"
    val idx = s"$base/idx"
    sketch.repartition(2).write.mode("append").parquet(raw)
    // another job holds the lock: the exclusive create must refuse, the
    // message must say how to recover, and NO generation may be written
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idx))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idx/${Compact.LockFile}"), "held")
    val e = intercept[RuntimeException](
      Compact.compactAndFlip(spark, raw, idx, "fp", Seq("fp", "doc_id"),
        partitions = Some(2)))
    assert(e.getMessage.contains(Compact.LockFile), e.getMessage)
    assert(Compact.currentGeneration(idx).isEmpty)
    assert(Compact.dataFileCount(s"$idx/gen-000001") == 0)
    // the loser must not have deleted the winner's lock on its way out
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/${Compact.LockFile}")))
    // lock released → compaction proceeds and cleans its lock up after
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$idx/${Compact.LockFile}"))
    val g = Compact.compactAndFlip(spark, raw, idx, "fp", Seq("fp", "doc_id"),
      partitions = Some(2))
    assert(g.count() == sketch.count())
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/${Compact.LockFile}")))
    Compact.rmTree(base)
  }

  test("df generation fold equals a direct document-frequency count") {
    val base = java.nio.file.Files.createTempDirectory("graft_dfgen").toString
    val deltas = s"$base/deltas"
    // three "micro-batch" delta generations, each counting only its batch
    (0 until 3).foreach { i =>
      sketch.filter(col("doc_id") % 3 === i)
        .groupBy("fp").agg(count(lit(1)).as("df"))
        .write.mode("append").parquet(deltas)
    }
    val merged = Compact.mergeDfGenerations(spark, deltas, s"$base/gen1")
    val direct = sketch.groupBy("fp").agg(count(lit(1)).as("df"))
    assert(merged.count() == direct.count())
    assert(merged.exceptAll(direct).count() == 0)
    Compact.rmTree(base)
  }

  test("shouldCompact trips on the streamed tail and resets after a compaction") {
    // the one-shot WHOLE-TAIL model (compactAndFlip over a per-statement
    // fresh scratch — the correctness entries' shape): the manual rmTree
    // below stands in for the fresh scratch; the SCHEDULER loop pairs the
    // predicate with compactCycle instead, which consumes its own tail —
    // pinned by the next test
    val base = java.nio.file.Files.createTempDirectory("graft_policy").toString
    val raw = s"$base/raw"
    val idx = sketch.select(col("fp").as("key"), col("doc_id").as("off"))
    assert(!Compact.shouldCompact(raw, s"$base/idx", 4),
      "empty tail must not trigger")
    (0 until 3).foreach { _ =>
      idx.repartition(2).write.mode("append").parquet(raw) }
    assert(Compact.dataFileCount(raw) == 6)
    assert(Compact.shouldCompact(raw, s"$base/idx", 4),
      "6-file tail over a 4-file budget must trigger")
    Compact.compactAndFlip(spark, raw, s"$base/idx",
      "key", Seq("key", "off"), partitions = Some(2))
    Compact.rmTree(raw)
    assert(!Compact.shouldCompact(raw, s"$base/idx", 4),
      s"compacted generation holds ${Compact.dataFileCount(s"$base/idx")} " +
        "files; the predicate must clear after the fold")
    Compact.rmTree(base)
  }

  test("compactCycle: the scheduler loop is coherent — each cycle consumes " +
      "exactly the tail it folded, loses nothing across cycles, and " +
      "clears the predicate without manual truncation") {
    val base = java.nio.file.Files.createTempDirectory("graft_cycle").toString
    val raw = s"$base/raw"
    val idxBase = s"$base/idx"
    val rows = sketch.select(col("fp").as("key"), col("doc_id").as("off"))
    val a = rows.filter(col("off") % 2 === 0)
    val b = rows.filter(col("off") % 2 === 1)
    a.repartition(3).write.mode("append").parquet(raw)
    assert(Compact.shouldCompact(raw, idxBase, 2))
    val g1 = Compact.compactCycle(spark, raw, idxBase, "key",
      Seq("key", "off"), partitions = Some(2))
    // the cycle consumed its tail: predicate clears with NO manual rmTree
    assert(Compact.dataFileCount(raw) == 0,
      "cycle must delete exactly the consumed tail files")
    assert(!Compact.shouldCompact(raw, idxBase, 4))
    assert(g1.count() == a.count())
    // the tail regrows; the second cycle folds generation ∪ new tail —
    // nothing previously compacted is lost
    b.repartition(3).write.mode("append").parquet(raw)
    assert(Compact.shouldCompact(raw, idxBase, 4))
    val g2 = Compact.compactCycle(spark, raw, idxBase, "key",
      Seq("key", "off"), partitions = Some(2))
    assert(Compact.dataFileCount(raw) == 0)
    assert(!Compact.shouldCompact(raw, idxBase, 4))
    assert(Compact.currentGeneration(idxBase)
      .contains(s"$idxBase/gen-000002"))
    assert(g2.count() == rows.count())
    assert(rows.exceptAll(g2).count() == 0)
    assert(g2.exceptAll(rows).count() == 0)
    Compact.rmTree(base)
  }

  test("admission check over compacted generations matches the stored sketch") {
    // end-to-end: incremental dedup reading (compacted streamed sketch +
    // folded df) equals the same check over the batch-materialized tables
    val base = java.nio.file.Files.createTempDirectory("graft_admit").toString
    val raw = s"$base/raw"
    (0 until 4).foreach { i =>
      sketch.filter(col("doc_id") % 4 === i).repartition(2)
        .write.mode("append").parquet(raw)
      sketch.filter(col("doc_id") % 4 === i)
        .groupBy("fp").agg(count(lit(1)).as("df"))
        .write.mode("append").parquet(s"$base/deltas")
    }
    val gen = Compact.compactIndex(spark, raw, s"$base/gen1",
      "fp", Seq("fp", "doc_id"), partitions = Some(4))
    val dfGen = Compact.mergeDfGenerations(spark, s"$base/deltas", s"$base/df1")
    val got = graft.ml.NearDup.incrementalDupesFrom(gen, dfGen,
      splitId = 250L, minShared = 2, maxDf = 50)
    val want = graft.ml.NearDup.incrementalDupesFrom(
      Catalog.winnowSketch(spark, dir), Catalog.winnowDf(spark, dir),
      splitId = 250L, minShared = 2, maxDf = 50)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    Compact.rmTree(base)
  }
}
