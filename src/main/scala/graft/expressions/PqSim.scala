package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd asymmetric PQ cosine over the M-byte code rows —
  * `graft_pq_sim(codes, qemb, qn)`.
  *
  * A product-quantized candidate is the concatenation of its chosen
  * per-subspace centroids; its dot with the raw query and its own norm
  * therefore read ONLY the M code bytes — every float comes from the
  * committed codebook constants (TrainedPqCodebooks, flattened once into a
  * referenced double[]). One pass accumulates both sums dimension-ordered
  * left-to-right — the same IEEE sequence as the DuckDB mirror's
  * list_dot_product over the reconstructed vector, so oracle hashes match.
  *
  * `qn` = dot(qemb, qemb) is passed in (computed once per query), as in
  * Sq8Sim.
  */
case class PqSim(codes: Expression, qemb: Expression, qn: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = qemb
  override def third: Expression = qn

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, qemb.dataType, qn.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_pq_sim expects (array<tinyint>, array<double>, double), " +
          s"got ${children.map(_.dataType.simpleString)}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codesV: Any, qembV: Any, qnV: Any): Any = {
    val c = codesV.asInstanceOf[ArrayData]
    val q = qembV.asInstanceOf[ArrayData]
    val qnD = qnV.asInstanceOf[Double]
    val cb = PqSim.flat
    val m = math.min(c.numElements(), PqSim.M)
    var num = 0.0; var nrm = 0.0
    var j = 0
    while (j < m) {
      val base = (j * PqSim.K + c.getByte(j)) * PqSim.SubDim
      var d = 0
      while (d < PqSim.SubDim) {
        val cv = cb(base + d)
        num += cv * q.getDouble(j * PqSim.SubDim + d)
        nrm += cv * cv
        d += 1
      }
      j += 1
    }
    num / math.sqrt(nrm * qnD)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqFlat", PqSim.flat, "double[]")
    nullSafeCodeGen(ctx, ev, (c, q, qnV) => {
      val num = ctx.freshName("num"); val nrm = ctx.freshName("nrm")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val base = ctx.freshName("base"); val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      s"""
         |double $num = 0.0; double $nrm = 0.0;
         |int $m = java.lang.Math.min($c.numElements(), ${PqSim.M});
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = ($j * ${PqSim.K} + $c.getByte($j)) * ${PqSim.SubDim};
         |  for (int $d = 0; $d < ${PqSim.SubDim}; $d++) {
         |    double $cv = $cb[$base + $d];
         |    $num += $cv * $q.getDouble($j * ${PqSim.SubDim} + $d);
         |    $nrm += $cv * $cv;
         |  }
         |}
         |${ev.value} = $num / java.lang.Math.sqrt($nrm * $qnV);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqSim =
    PqSim(newFirst, newSecond, newThird)

  override def prettyName: String = "graft_pq_sim"
}

object PqSim {
  /** Codebook geometry mirrored from graft.ml.Pq (duplicated as plain ints
    * here so the expression has no initialization-order dependence on the
    * ml package object graph). */
  val M = 8; val K = 16; val SubDim = 8

  /** TrainedPqCodebooks flattened to (j·K + k)·SubDim + d — one shared
    * immutable array referenced by every generated loop. */
  lazy val flat: Array[Double] = {
    val books = graft.ml.TrainedPqCodebooks.books
    val out = new Array[Double](M * K * SubDim)
    for (j <- 0 until M; k <- 0 until K; d <- 0 until SubDim)
      out((j * K + k) * SubDim + d) = books(j)(k)(d)
    out
  }
}
