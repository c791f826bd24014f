package graft.compiler

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast._
import graft.functions.Funcs
import graft.operators.PostingAlgebra._

/** Compiles a cantera `Query` AST onto posting DataFrames (off, score) —
  * the Spark replacement for the reference's vector-materializing interpreter
  * ProcessSubQuery (/root/reference/src/query.cc:394-622). Every node becomes
  * a declarative DataFrame transform, so Catalyst gets the whole tree
  * (pushdown, join selection, AQE) instead of executing node-by-node.
  *
  * @param index     posting index (key, off, score)
  * @param summaries summary table (off, key, json)
  * @param blobs     optional local blob table (key, data) standing in for the
  *                  external CAS store of S4 (query.cc:228-305); SURVEY §2.1
  *                  models CAS as a local blob DataFrame.
  */
final class QueryCompiler(
    spark: SparkSession,
    index: DataFrame,
    summaries: DataFrame,
    blobs: Option[DataFrame] = None) {

  /** S4 side-channel: (off, _header, _header_key) collected from CAS-expansion
    * leaves during compilation — the Spark analogue of the reference's global
    * `extra_data` map (query.cc:57,892-898), applied by QueryExec at output. */
  private var extra: Option[DataFrame] = None
  def extraData: Option[DataFrame] = extra

  def compile(q: Query): DataFrame = q match {
    case Leaf(id) => leaf(Funcs.decodeUriComponent(id))
    case DocKey(k) =>
      summaries.filter(col("key") === k)
        .select(col("off"), lit(0.0).as("score"))
    case Bin(BinKind.Or, l, r) => or(compile(l), compile(r))
    case Bin(BinKind.And, l, r) => and(compile(l), compile(r))
    case Bin(BinKind.Subtract, l, r) => subtract(compile(l), compile(r))
    case Bin(BinKind.OrderBy, l, r) => orderByQuery(compile(l), compile(r))
    case CmpScalar(CmpOp.Eq, l, v) => scoreEq(compile(l), v)
    case CmpScalar(op, l, v) => scoreCmp(compile(l), op.sym, v)
    case CmpQuery(op, l, r) => thetaCompare(compile(l), compile(r), op.sym)
    case InRange(l, lo, hi) => scoreRange(compile(l), lo, hi)
    case Sample(l, n) => randomSample(compile(l), n.toInt)
    case Un(UnKind.Max, l) => dedupMax(compile(l))
    case Un(UnKind.Min, l) => dedupMin(compile(l))
    case Un(UnKind.Negate, l) => graft.operators.PostingAlgebra.negate(compile(l))
  }

  /** Leaf dispatch (query.cc:222-356): `FIELD-in:KEY` → CAS expansion (S4),
    * `in-FIELD:PARAM` → prefix+contains scan (S3), else plain lookup (S1). */
  private def leaf(token: String): DataFrame = {
    val colonAt = token.indexOf(':')
    if (colonAt > 3 && token.regionMatches(colonAt - 3, "-in", 0, 3))
      casExpansion(token.substring(0, colonAt - 3), token.substring(colonAt + 1))
    else if (token.startsWith("in-") && colonAt >= 0) {
      val field = token.substring(3, colonAt)
      val param = token.substring(colonAt + 1)
      index.filter(col("key").startsWith(field) &&
          lower(col("key")).contains(param.toLowerCase))
        .select(col("off")).distinct()
        .withColumn("score", lit(0.0))
    } else
      index.filter(col("key") === token).select("off", "score")
  }

  /** S4 — `FIELD-in:KEY`: fetch the blob stored under KEY, extract DNS-ish
    * names and {header} markers, look each name up as `FIELD:name`, union the
    * distinct offsets with score 0 (query.cc:228-305). Headers ride the
    * `extra` side-channel. The `links:` → `name:` alias is query.cc:239. */
  private def casExpansion(fieldRaw: String, blobKey: String): DataFrame = {
    val field = if (fieldRaw == "links") "name" else fieldRaw
    val blobDf = blobs.getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("data", org.apache.spark.sql.types.StringType)))))
    val extractUdf = udf { data: String =>
      Funcs.extractNames(Option(data).getOrElse(""))
        .map { case (n, h, hk) => (n, h, hk) }
    }
    val names = blobDf.filter(col("key") === blobKey)
      .select(explode(extractUdf(col("data"))).as("n"))
      .select(
        concat(lit(field + ":"), col("n._1")).as("lookup_key"),
        col("n._2").as("_header"), col("n._3").as("_header_key"))
    // One blob key → a small name set: broadcast it against the index scan.
    val hits = index.join(broadcast(names), col("key") === col("lookup_key"))
      .select(col("off"), col("_header"), col("_header_key"))
    // Reference stuffs headers into an unordered map (last write wins,
    // nondeterministic); we pin the contract to the lexicographically first
    // (header_key, header) per offset for determinism.
    val withHeaders = hits.filter(col("_header") =!= "")
      .groupBy("off")
      .agg(min(struct(col("_header_key"), col("_header"))).as("h"))
      .select(col("off"), col("h._header"), col("h._header_key"))
    extra = Some(extra.fold(withHeaders)(e =>
      e.unionByName(withHeaders).groupBy("off")
        .agg(min(struct(col("_header_key"), col("_header"))).as("h"))
        .select(col("off"), col("h._header"), col("h._header_key"))))
    hits.select("off").distinct().withColumn("score", lit(0.0))
  }
}
