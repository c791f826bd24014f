package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized pinning of the quantized ranking kernels against their naive
  * reference models: graft_sq8_sim must equal dequantize-then-cosine and
  * graft_pq_sim must equal reconstruct-then-cosine, for random codes,
  * queries, and quantizer constants. The kernels compute an algebraic
  * DECOMPOSITION of the reference (affine correction factored out of the
  * per-element loop), so equality is to relative tolerance, not bitwise —
  * the bitwise contract lives with the DuckDB oracles, which mirror the
  * decomposition itself. Exercised through selectExpr so the CODEGEN path
  * runs, not just the interpreted eval. */
class KernelProps extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(1e-12, math.max(math.abs(a), math.abs(b)))

  test("graft_sq8_sim == dequantize-then-cosine on random rows") {
    val rows = (1 to 100).map { _ =>
      val codes = Seq.fill(64)((rnd.nextInt(256) - 128).toByte)
      val qemb = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
      val mn = rnd.nextDouble() * 2 - 1
      val scale = rnd.nextDouble() * 0.02 + 1e-4
      val qn = qemb.map(x => x * x).sum
      (codes, qemb, mn, scale, qn)
    }
    val got = rows.toDF("codes", "qemb", "mn", "scale", "qn")
      .selectExpr("graft_sq8_sim(codes, qemb, mn, scale, qn) AS s")
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((codes, qemb, mn, scale, qn), g) =>
      val xq = codes.map(c => mn + (c + 128) * scale)
      val num = xq.zip(qemb).map { case (a, b) => a * b }.sum
      val nrm = xq.map(a => a * a).sum
      val ref = num / math.sqrt(nrm * qn)
      assert(relErr(g, ref) < 1e-9, s"kernel $g vs reference $ref")
    }
  }

  test("graft_pq_sim == reconstruct-then-cosine on random rows") {
    val books = graft.ml.TrainedPqCodebooks.books
    val rows = (1 to 100).map { _ =>
      val codes = Seq.fill(graft.ml.Pq.M)(
        rnd.nextInt(graft.ml.Pq.Ksub).toByte)
      val qemb = Seq.fill(64)(rnd.nextDouble() * 2 - 1)
      val qn = qemb.map(x => x * x).sum
      (codes, qemb, qn)
    }
    val got = rows.toDF("codes", "qemb", "qn")
      .selectExpr("graft_pq_sim(codes, qemb, qn) AS s")
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((codes, qemb, qn), g) =>
      val xq = codes.zipWithIndex.flatMap { case (c, j) => books(j)(c.toInt) }
      val num = xq.zip(qemb).map { case (a, b) => a * b }.sum
      val nrm = xq.map(a => a * a).sum
      val ref = num / math.sqrt(nrm * qn)
      assert(relErr(g, ref) < 1e-9, s"kernel $g vs reference $ref")
    }
  }
}
