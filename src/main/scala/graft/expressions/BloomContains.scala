package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column —
  * `graft_bloom_contains(value, filter_bytes)` — the pre-join pruning
  * primitive behind CorpusOps.decontaminateBloom.
  *
  * Why a native Expression: the probe sits on the 100 TB side of a
  * semi-join (every corpus shingle passes through it), so it must stay
  * inside whole-stage codegen; a Scala UDF would serialize the filter per
  * task closure AND break the codegen span. The filter arrives as a
  * FOLDABLE binary child (the same shipping convention as Spark's own
  * BloomFilterMightContain from runtime row-level filtering): a literal in
  * the task binary, deserialized once per executor thread via a transient
  * lazy, never per row.
  *
  * Hash contract: probes `mightContainBinary` over the value's UTF-8
  * bytes — the identical bytes `DataFrameStatFunctions.bloomFilter` feeds
  * when building over a string column, so build and probe agree. No false
  * negatives, ~fpp false positives; callers must re-verify positives with
  * an exact join (decontaminateBloom does).
  */
case class BloomContains(value: Expression, filter: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = filter

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == StringType && filter.dataType == BinaryType &&
        filter.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bloom_contains expects (string value, foldable binary filter), " +
        s"got (${value.dataType.simpleString}, ${filter.dataType.simpleString}" +
        s"${if (filter.foldable) "" else ", non-foldable"})")

  override def dataType: DataType = BooleanType

  // a NULL filter literal is always a caller bug (the builder lost its
  // bloom bytes), and the pruning sits upstream of a correctness gate:
  // returning NULL here would drop every row and render an EMPTY
  // decontamination result — indistinguishable from a genuinely clean
  // corpus, the worst failure direction. Fail the query instead; the
  // filter is foldable, so this throws at first eval/codegen, before any
  // partial results exist.
  @transient private lazy val bloom: BloomFilter = {
    val bytes = filter.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) throw new IllegalStateException(
      "graft_bloom_contains: filter bytes are NULL — a null filter would " +
        "silently prune everything; build the bloom before planning")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (v == null) null
    else bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $bf.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(value = newLeft, filter = newRight)

  override def prettyName: String = "graft_bloom_contains"
}
