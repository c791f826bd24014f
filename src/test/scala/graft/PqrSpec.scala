package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Ann, Pq, TrainedCentroids, TrainedPqCodebooks, TrainedPqrCodebooks}

class PqrSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def encodeErr(v: Array[Double], books: Seq[Seq[Seq[Double]]],
      base: Array[Double]): Double = {
    // reconstruction error of coding (v - base) through `books`, i.e.
    // ||v - (base + decode(code(v - base)))||²; base = 0 is the raw tier
    var err = 0.0
    for (j <- 0 until Pq.M) {
      val r = Array.tabulate(Pq.SubDim)(d =>
        v(j * Pq.SubDim + d) - base(j * Pq.SubDim + d))
      val best = books(j).minBy(c =>
        (0 until Pq.SubDim).map(d => (r(d) - c(d)) * (r(d) - c(d))).sum)
      err += (0 until Pq.SubDim)
        .map(d => (r(d) - best(d)) * (r(d) - best(d))).sum
    }
    err
  }

  test("residual coding reconstructs with lower error than raw PQ " +
      "(the IVFPQ design claim, Jégou et al. 2011)") {
    val emb = graft.model.Catalog.embeddings(spark, dir)
    val cells = Ann.cellAssignment(emb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val zero = Array.fill(Ann.Dims)(0.0)
    val (rawSum, resSum) = vecs.foldLeft((0.0, 0.0)) {
      case ((ra, re), (id, v)) =>
        val cent = TrainedCentroids.matrix(cells(id).toInt - 1).toArray
        (ra + encodeErr(v, TrainedPqCodebooks.books, zero),
          re + encodeErr(v, TrainedPqrCodebooks.books, cent))
    }
    val (rawMse, resMse) = (rawSum / vecs.length, resSum / vecs.length)
    assert(resMse < rawMse,
      s"residual MSE $resMse must beat raw-PQ MSE $rawMse")
    // the win must be material, not noise — the coarse term absorbs real
    // between-cell variance on this corpus
    assert(resMse < rawMse * 0.95,
      s"residual MSE $resMse not materially below raw $rawMse")
  }

  test("PqrSim kernel nulls on out-of-range cell or code, never a " +
      "partial similarity") {
    val q = (1 to Ann.Dims).map(_ => "0.1D").mkString("array(", ",", ")")
    def simOf(codes: String, cell: String): java.lang.Double = {
      val r = spark.sql(
        s"SELECT graft_pqr_sim($codes, $cell, $q, 1.0D) AS s").collect()(0)
      if (r.isNullAt(0)) null else r.getDouble(0)
    }
    val codes = s"cast(array(${Seq.fill(Pq.M)(0).mkString(",")}) as array<tinyint>)"
    assert(simOf(codes, "1L") != null)
    assert(simOf(codes, "0L") == null, "cell 0 is out of range (1-based)")
    assert(simOf(codes, s"${PqrSimCells + 1}L") == null)
    val badCode = s"cast(array(${(Seq.fill(Pq.M - 1)(0) :+ 99).mkString(",")}) as array<tinyint>)"
    assert(simOf(badCode, "1L") == null)
    val shortCodes = s"cast(array(0) as array<tinyint>)"
    assert(simOf(shortCodes, "1L") == null)
  }

  private def PqrSimCells: Int = graft.expressions.PqrSim.Cells

  test("batched residual-PQ serving == per-query single lookups, " +
      "partition-pruned through the PqrSim kernel") {
    val emb = graft.model.Catalog.embeddings(spark, dir)
    val store = graft.model.Catalog.pqrIvfStore(spark, dir)
    val df = graft.ml.PqResidual.pqrIvfTopKBatchFrom(store, emb,
      emb.filter(col("vec_id") < 8), 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pqr_ivf"), s"batch plan does not scan pqr_ivf:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"batch plan has a cartesian product:\n$p")
    assert(p.contains("graft_pqr_sim"),
      s"batch path does not rank through the residual kernel:\n$p")
    assert("""PartitionFilters: \[[^\]]*(dynamicpruning|cell#\d+[^\]]* IN )""".r
        .findFirstIn(p).isDefined,
      s"no probed-cell partition filter on the batch pqr_ivf scan:\n$p")
    val batch = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val singles = (0L until 8L).flatMap { qid =>
      graft.ml.PqResidual.pqrIvfTopKFrom(store, emb, qid, 10).collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == singles)
    graft.util.Caches.drain()
  }

  test("filtered and masked residual serving restrict the candidate set " +
      "and agree with post-filtering the unrestricted ranking chain") {
    val emb = graft.model.Catalog.embeddings(spark, dir)
    val store = graft.model.Catalog.pqrIvfStore(spark, dir)
    // the slice: even vec_ids — big enough that top-k is full
    val allowed = emb.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
    val got = graft.ml.PqResidual
      .pqrIvfTopKAllowed(store, emb, 0L, allowed, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    assert(got.forall(_._1 % 2 == 0), "filtered serve leaked a non-slice id")
    // reference: rank the unrestricted chain deep, then post-filter —
    // the semi-join must commute with the scoring
    val deep = graft.ml.PqResidual.pqrIvfTopKFrom(store, emb, 0L, 10000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 % 2 == 0).take(10)
    assert(got.toSeq == deep.toSeq)
    // masked is the complement restriction: no tombstoned id may surface
    val dead = emb.select(col("vec_id")).filter(col("vec_id") < 50)
    val masked = graft.ml.PqResidual
      .pqrIvfTopKMasked(store, emb, 0L, dead, 10).collect()
      .map(_.getLong(0))
    assert(masked.forall(_ >= 50), "masked serve surfaced a tombstoned id")
    graft.util.Caches.drain()
  }
}
