package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays — the hot scalar of every
  * embedding operator (cosine similarity, LSH signature bits).
  *
  * Why a native Expression: the `aggregate(zip_with(a, b, _*_), ...)` chain
  * is a higher-order function — evaluated per row through interpreted lambda
  * machinery, outside whole-stage codegen. At 100 TB the similarity path is
  * compute-bound on exactly this loop, so it gets the tight generated loop
  * instead (SURVEY §2.10: custom Catalyst work only where built-ins can't
  * express the semantics *efficiently*).
  *
  * Accepts float or double arrays (the testdata stores float32 embeddings);
  * accumulation is always double, left-to-right in index order — the same
  * IEEE sequence as DuckDB's list_dot_product, so oracle hashes match.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double|float> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sum = ctx.freshName("sum")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |double $sum = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
