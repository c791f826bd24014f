package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd asymmetric SQ8 cosine over the RAW byte codes —
  * `graft_sq8_sim(codes, qemb, mn, scale, qn)`.
  *
  * The quantized serving paths previously ranked by dequantizing each
  * candidate row to an `array<double>` (a per-row allocation 8× wider than
  * the byte codes) and feeding graft_dot. This kernel ranks in the integer
  * domain instead: with the affine map xq_i = mp + c_i·scale
  * (mp = mn + 128·scale folding the byte-shift back out), the dequantized
  * dot and norm decompose into code-only sums —
  *
  *   dot(xq, q)  = mp·Σq_i + scale·Σc_i·q_i
  *   dot(xq, xq) = mp²·n + 2·mp·scale·Σc_i + scale²·Σc_i²
  *
  * so one pass over the byte array (plus the query's doubles) yields the
  * exact same similarity with the affine correction applied once per row,
  * and the ranking loop's memory traffic stays at the stored byte width —
  * the 4× the codes save on disk is no longer re-inflated per candidate in
  * the hot path. Σc_i and Σc_i² accumulate in long (exact for any array
  * length under 2^47); the float sums accumulate left-to-right in index
  * order, the same IEEE sequence as the DuckDB mirror's list_sum /
  * list_dot_product, so oracle hashes match.
  *
  * `qn` = dot(qemb, qemb) is passed in (computed once per query, as in
  * graft.ml.Ann.asymSim) rather than re-derived per candidate.
  */
case class Sq8Sim(codes: Expression, qemb: Expression, mn: Expression,
    scale: Expression, qn: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] = Seq(codes, qemb, mn, scale, qn)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (codes.dataType, qemb.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok && Seq(mn, scale, qn).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_sq8_sim expects (array<tinyint>, array<double>, double, " +
        s"double, double), got ${children.map(_.dataType.simpleString)}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(codesV: Any, qembV: Any, mnV: Any, scaleV: Any,
      qnV: Any): Any = {
    val c = codesV.asInstanceOf[ArrayData]
    val q = qembV.asInstanceOf[ArrayData]
    val mnD = mnV.asInstanceOf[Double]
    val scaleD = scaleV.asInstanceOf[Double]
    val qnD = qnV.asInstanceOf[Double]
    // a registered SQL function must not trust its inputs: mismatched code
    // and query lengths yield NULL, never a silent partial-vector
    // similarity (ADVICE r13 — same safety policy as graft_pq_sim; the
    // engine's plans always pass equal lengths)
    if (c.numElements() != q.numElements()) return null
    val n = c.numElements()
    var t = 0.0; var sq = 0.0; var s1 = 0L; var s2 = 0L
    var i = 0
    while (i < n) {
      val cv = c.getByte(i)
      val qv = q.getDouble(i)
      t += cv.toDouble * qv
      sq += qv
      s1 += cv
      s2 += cv.toLong * cv
      i += 1
    }
    val mp = mnD + 128.0 * scaleD
    val num = mp * sq + scaleD * t
    val nrm = mp * mp * n + 2.0 * mp * scaleD * s1 + scaleD * scaleD * s2
    num / math.sqrt(nrm * qnD)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q, mnV, scaleV, qnV) => {
      val t = ctx.freshName("t"); val sq = ctx.freshName("sq")
      val s1 = ctx.freshName("s1"); val s2 = ctx.freshName("s2")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cv = ctx.freshName("cv"); val qv = ctx.freshName("qv")
      val mp = ctx.freshName("mp")
      s"""
         |if ($c.numElements() != $q.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $t = 0.0; double $sq = 0.0; long $s1 = 0L; long $s2 = 0L;
         |  int $n = $c.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    byte $cv = $c.getByte($i);
         |    double $qv = $q.getDouble($i);
         |    $t += (double)$cv * $qv;
         |    $sq += $qv;
         |    $s1 += $cv;
         |    $s2 += (long)$cv * $cv;
         |  }
         |  double $mp = $mnV + 128.0 * $scaleV;
         |  ${ev.value} = ($mp * $sq + $scaleV * $t) /
         |    java.lang.Math.sqrt(($mp * $mp * $n + 2.0 * $mp * $scaleV * $s1
         |      + $scaleV * $scaleV * $s2) * $qnV);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sq8Sim =
    Sq8Sim(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))

  override def prettyName: String = "graft_sq8_sim"
}
