package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Quant

class RandProjSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sign(k: Int, i: Int): Double =
    if (md5hex(s"rp:$k:$i").head < '8') 1.0 else -1.0

  test("a one-hot embedding projects to its sign-matrix column over sqrt(d)") {
    val d = 64
    val emb = Array.fill(d)(0.0f); emb(4) = 1.0f // coordinate i = 5 (1-based)
    val df = Seq((1L, emb.toSeq, 0)).toDF("vec_id", "embedding", "label")
    val got = Quant.randProject(df, d, 16).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    (0 until 16).foreach { k =>
      assert(got(k.toLong) == BigDecimal(sign(k, 5) / 8.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"k=$k must be s(k,5)/sqrt(64)")
    }
  }

  test("projection is linear on integer-valued embeddings") {
    val d = 64
    val a = Array.tabulate(d)(i => ((i % 5) - 2).toFloat)
    val b = Array.tabulate(d)(i => ((i % 3) - 1).toFloat)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a.toSeq, 0), (2L, b.toSeq, 0), (3L, ab.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val got = Quant.randProject(df, d, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0 until 16).foreach { k =>
      // integer-valued sums are IEEE-exact, so linearity holds exactly
      // through the rounding
      assert(got((3L, k.toLong)) == BigDecimal(
        (got((1L, k.toLong)) + got((2L, k.toLong))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("the coarse stage preserves a planted near-duplicate at rank 1") {
    // JL's guarantee is about STRONG similarities: a scaled copy of the
    // query (cosine exactly 1) must survive the projected cut and win the
    // exact rerank. A random corpus is the worst case — its neighbors are
    // all near-equidistant, which no 4x sketch can separate — so the
    // strong-pair pin is the meaningful one (the ann recall gates use the
    // same planted-fixture reasoning).
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val base = graft.model.Catalog.embeddings(spark, dir)
    val planted = base.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"),
        expr("transform(embedding, x -> x * CAST(0.5 AS FLOAT))")
          .as("embedding"),
        col("label"))
    val emb = base.unionByName(planted)
    val proj = Quant.randProjectVec(emb, 64, 16)
    val top = Quant.projTopK(proj, emb, 0, 50, 10, 16).collect()
    assert(top.head.getLong(0) == 9999L,
      s"scaled twin must win: ${top.map(_.getLong(0)).toSeq}")
    assert(top.head.getDouble(1) == 1.0)
  }

  test("random-corpus coarse recall stays above the observed floor") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.model.Catalog.embeddings(spark, dir)
    val proj = Quant.randProjectVec(emb, 64, 16)
    val twoStage = Quant.projTopK(proj, emb, 0, 50, 10, 16).collect()
      .map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("emb_topk")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert((twoStage & exact).size >= 3,
      s"even the equidistant worst case keeps a few exact winners")
  }
}
