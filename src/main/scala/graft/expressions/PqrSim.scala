package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd asymmetric RESIDUAL-PQ cosine —
  * `graft_pqr_sim(codes, cell, qemb, qn)`.
  *
  * The IVFADC reconstruction (Jégou et al. 2011): a candidate is its
  * coarse centroid PLUS its chosen per-subspace residual centroids, so the
  * kernel reads the M code bytes and the cell id — every float comes from
  * two committed constant tables (TrainedCentroids for the coarse term,
  * TrainedPqrCodebooks for the residual term). One pass accumulates dot
  * and norm dimension-ordered left-to-right with the per-dimension
  * `centroid + residual` addition first — the same IEEE sequence as the
  * DuckDB mirror's `list_transform(…, i -> cemb[i] + xqr[i])` then
  * list_dot_product, so oracle hashes match.
  *
  * `cell` is the 1-based coarse cell id (the TrainedCentroids convention);
  * like PqSim, all inputs are bounds-checked to NULL, never a partial sim.
  */
case class PqrSim(codes: Expression, cell: Expression, qemb: Expression,
    qn: Expression) extends QuaternaryExpression {

  override def first: Expression = codes
  override def second: Expression = cell
  override def third: Expression = qemb
  override def fourth: Expression = qn

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, cell.dataType, qemb.dataType, qn.dataType) match {
      case (ArrayType(ByteType, _), LongType, ArrayType(DoubleType, _),
          DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_pqr_sim expects (array<tinyint>, bigint, array<double>, " +
          s"double), got ${children.map(_.dataType.simpleString)}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(codesV: Any, cellV: Any, qembV: Any,
      qnV: Any): Any = {
    val c = codesV.asInstanceOf[ArrayData]
    val cellId = cellV.asInstanceOf[Long]
    val q = qembV.asInstanceOf[ArrayData]
    val qnD = qnV.asInstanceOf[Double]
    val cb = PqrSim.flat
    val cents = PqrSim.centFlat
    val m = PqSim.M
    val dims = m * PqSim.SubDim
    if (c.numElements() != m) return null
    if (q.numElements() < dims) return null
    if (cellId < 1 || cellId > PqrSim.Cells) return null
    val cBase = (cellId.toInt - 1) * dims
    var num = 0.0; var nrm = 0.0
    var j = 0
    while (j < m) {
      val code = c.getByte(j)
      if (code < 0 || code >= PqSim.K) return null
      val base = (j * PqSim.K + code) * PqSim.SubDim
      var d = 0
      while (d < PqSim.SubDim) {
        val dim = j * PqSim.SubDim + d
        val cv = cents(cBase + dim) + cb(base + d)
        num += cv * q.getDouble(dim)
        nrm += cv * cv
        d += 1
      }
      j += 1
    }
    num / math.sqrt(nrm * qnD)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqrFlat", PqrSim.flat, "double[]")
    val cents = ctx.addReferenceObj("pqrCents", PqrSim.centFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (c, cellV, q, qnV) => {
      val num = ctx.freshName("num"); val nrm = ctx.freshName("nrm")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val base = ctx.freshName("base"); val cv = ctx.freshName("cv")
      val m = ctx.freshName("m"); val code = ctx.freshName("code")
      val dim = ctx.freshName("dim"); val cBase = ctx.freshName("cBase")
      s"""
         |double $num = 0.0; double $nrm = 0.0;
         |int $m = ${PqSim.M};
         |if ($c.numElements() != $m ||
         |    $q.numElements() < $m * ${PqSim.SubDim} ||
         |    $cellV < 1 || $cellV > ${PqrSim.Cells}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $cBase = ((int) $cellV - 1) * ($m * ${PqSim.SubDim});
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    byte $code = $c.getByte($j);
         |    if ($code < 0 || $code >= ${PqSim.K}) { ${ev.isNull} = true; break; }
         |    int $base = ($j * ${PqSim.K} + $code) * ${PqSim.SubDim};
         |    for (int $d = 0; $d < ${PqSim.SubDim}; $d++) {
         |      int $dim = $j * ${PqSim.SubDim} + $d;
         |      double $cv = $cents[$cBase + $dim] + $cb[$base + $d];
         |      $num += $cv * $q.getDouble($dim);
         |      $nrm += $cv * $cv;
         |    }
         |  }
         |  ${ev.value} = $num / java.lang.Math.sqrt($nrm * $qnV);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqrSim =
    PqrSim(newFirst, newSecond, newThird, newFourth)

  override def prettyName: String = "graft_pqr_sim"
}

object PqrSim {
  /** Residual-codebook geometry must match the raw tier's (the encode and
    * kernel share PqSim's M/K/SubDim). */
  lazy val flat: Array[Double] = {
    val books = graft.ml.TrainedPqrCodebooks.books
    require(books.length == PqSim.M && books.forall(b =>
      b.length == PqSim.K && b.forall(_.length == PqSim.SubDim)),
      s"ragged residual codebooks: expected ${PqSim.M}x${PqSim.K}x${PqSim.SubDim}")
    val out = new Array[Double](PqSim.M * PqSim.K * PqSim.SubDim)
    for (j <- 0 until PqSim.M; k <- 0 until PqSim.K; d <- 0 until PqSim.SubDim)
      out((j * PqSim.K + k) * PqSim.SubDim + d) = books(j)(k)(d)
    out
  }

  val Cells: Int = graft.ml.TrainedCentroids.matrix.length

  /** TrainedCentroids flattened to (cell-1)*Dims + dim. */
  lazy val centFlat: Array[Double] = {
    val m = graft.ml.TrainedCentroids.matrix
    val dims = m.head.length
    require(m.forall(_.length == dims), "ragged centroid matrix")
    val out = new Array[Double](m.length * dims)
    for (c <- m.indices; d <- 0 until dims) out(c * dims + d) = m(c)(d)
    out
  }
}
