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

  override def nullable: Boolean = true

  override def nullSafeEval(codesV: Any, qembV: Any, qnV: Any): Any = {
    val c = codesV.asInstanceOf[ArrayData]
    val q = qembV.asInstanceOf[ArrayData]
    val qnD = qnV.asInstanceOf[Double]
    val cb = PqSim.flat
    val m = PqSim.M
    // a registered SQL function must not trust its inputs: a codes array
    // whose length differs from the codebook geometry, a query array
    // shorter than the geometry, or a code byte outside the codebook all
    // yield NULL — never a truncated partial-subspace similarity (ADVICE
    // r13) and never an out-of-bounds read (the engine's own plans always
    // satisfy all three — bounds cost nothing on the hot path)
    if (c.numElements() != m) return null
    if (q.numElements() < m * PqSim.SubDim) return null
    var num = 0.0; var nrm = 0.0
    var j = 0
    while (j < m) {
      val code = c.getByte(j)
      if (code < 0 || code >= PqSim.K) return null
      val base = (j * PqSim.K + code) * PqSim.SubDim
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
      val m = ctx.freshName("m"); val code = ctx.freshName("code")
      s"""
         |double $num = 0.0; double $nrm = 0.0;
         |int $m = ${PqSim.M};
         |if ($c.numElements() != $m ||
         |    $q.numElements() < $m * ${PqSim.SubDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    byte $code = $c.getByte($j);
         |    if ($code < 0 || $code >= ${PqSim.K}) { ${ev.isNull} = true; break; }
         |    int $base = ($j * ${PqSim.K} + $code) * ${PqSim.SubDim};
         |    for (int $d = 0; $d < ${PqSim.SubDim}; $d++) {
         |      double $cv = $cb[$base + $d];
         |      $num += $cv * $q.getDouble($j * ${PqSim.SubDim} + $d);
         |      $nrm += $cv * $cv;
         |    }
         |  }
         |  ${ev.value} = $num / java.lang.Math.sqrt($nrm * $qnV);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqSim =
    PqSim(newFirst, newSecond, newThird)

  override def prettyName: String = "graft_pq_sim"
}

object PqSim {
  /** Codebook geometry DERIVED from the committed codebooks' actual shape
    * (not duplicated constants — a regenerated TrainedPqCodebooks with a
    * different geometry would otherwise silently truncate the flattening
    * and rank with wrong centroids). The ragged-shape require fails loudly
    * at first use instead. */
  val M: Int = graft.ml.TrainedPqCodebooks.books.length
  val K: Int = graft.ml.TrainedPqCodebooks.books.head.length
  val SubDim: Int = graft.ml.TrainedPqCodebooks.books.head.head.length

  /** TrainedPqCodebooks flattened to (j·K + k)·SubDim + d — one shared
    * immutable array referenced by every generated loop. */
  lazy val flat: Array[Double] = {
    val books = graft.ml.TrainedPqCodebooks.books
    require(books.forall(b => b.length == K && b.forall(_.length == SubDim)),
      s"ragged PQ codebooks: expected ${M}x${K}x$SubDim")
    val out = new Array[Double](M * K * SubDim)
    for (j <- 0 until M; k <- 0 until K; d <- 0 until SubDim)
      out((j * K + k) * SubDim + d) = books(j)(k)(d)
    out
  }
}
