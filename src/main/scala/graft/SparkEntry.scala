package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Catalog
import graft.operators.PostingAlgebra
import graft.operators.PostingAlgebra._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB SQL in `oracleSql` (over the same
  * parquet tables, via the shared `idx`/`summ` CTE derivations in Catalog).
  */
object SparkEntry {

  private val IDX = Catalog.indexSql
  private val SUMM = Catalog.summariesSql

  /** Flagship: QUERY ('status:F' AND 'price' > 150000 ORDER BY 'price') LIMIT 10
    * — leaf scan → AND → score filter → order-by-query → dedup → top-K →
    * summary join (SURVEY §7.2 M0 slice). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val idx = Catalog.index(spark, dir)
    val statusF = idx.filter(col("key") === "status:F")
    val price = idx.filter(col("key") === "price")
    val q = topK(dedupMax(orderByQuery(and(statusF, scoreCmp(price, ">", 150000)), price)), 10)
    q.join(Catalog.summaries(spark, dir), Seq("off"), "left_outer")
  }

  private def idxKey(s: SparkSession, dir: String, k: String): DataFrame =
    Catalog.index(s, dir).filter(col("key") === k).select("off", "score")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S: scans / sources (SURVEY §2.1) ----
    "s1_keyword_leaf" -> ((s, dir) => idxKey(s, dir, "price")),
    "s2_key_lookup" -> ((s, dir) =>
      Catalog.summaries(s, dir).filter(col("key") === "order:42")
        .select(col("off"), lit(0.0).as("score"))),
    "s3_prefix_scan" -> ((s, dir) =>
      Catalog.index(s, dir)
        .filter(col("key").startsWith("priority:") &&
          lower(col("key")).contains("high"))
        .select("off").distinct()
        .withColumn("score", lit(0.0))),
    "s5_summary_fetch" -> ((s, dir) =>
      topK(dedupMax(idxKey(s, dir, "price")), 25)
        .join(Catalog.summaries(s, dir), Seq("off"), "inner")
        .select("off", "key", "json")),

    // ---- F: score filters (SURVEY §2.2) ----
    "f1_eq" -> ((s, dir) => scoreEq(idxKey(s, dir, "qty"), 25.0)),
    "f2_gt" -> ((s, dir) => scoreCmp(idxKey(s, dir, "price"), ">", 150000.0)),
    "f3_le" -> ((s, dir) => scoreCmp(idxKey(s, dir, "price"), "<=", 50000.0)),
    "f4_range" -> ((s, dir) =>
      scoreRange(idxKey(s, dir, "orderdate"), 9600.0, 9500.0)),

    // ---- J: posting-set joins (SURVEY §2.3); final dedup = J6 ----
    "j1_or" -> ((s, dir) =>
      dedupMax(or(idxKey(s, dir, "status:F"), idxKey(s, dir, "status:O")))),
    "j2_and" -> ((s, dir) =>
      dedupMax(and(idxKey(s, dir, "qty"), idxKey(s, dir, "status:F")))),
    "j3_subtract" -> ((s, dir) =>
      dedupMax(subtract(idxKey(s, dir, "price"), idxKey(s, dir, "status:F")))),
    "j4_theta_gt" -> ((s, dir) =>
      dedupMax(thetaCompare(idxKey(s, dir, "lineprice"), idxKey(s, dir, "price"), ">"))),
    "j5_order_by" -> ((s, dir) =>
      dedupMax(orderByQuery(idxKey(s, dir, "status:F"), idxKey(s, dir, "price")))),
    "j6_dedup_min" -> ((s, dir) => dedupMin(idxKey(s, dir, "qty"))),

    // ---- A: aggregations (SURVEY §2.4) ----
    "a1_max" -> ((s, dir) => dedupMax(idxKey(s, dir, "qty"))),
    "a3_negate" -> ((s, dir) =>
      PostingAlgebra.negate(dedupMax(idxKey(s, dir, "price")))),
    "a4_count" -> ((s, dir) =>
      and(scoreCmp(idxKey(s, dir, "price"), ">", 100000.0), idxKey(s, dir, "status:O"))
        .agg(count(lit(1)).as("cnt"))),
    "a5_merge_sum" -> ((s, dir) =>
      Catalog.index(s, dir).filter(col("key") === "qty")
        .groupBy("key", "off").agg(sum("score").as("score"))),
    "a8_key_counts" -> ((s, dir) =>
      Catalog.index(s, dir).groupBy("key").agg(count(lit(1)).as("cnt"))),

    // ---- T: top-K / sampling (SURVEY §2.6) ----
    "t1_topk" -> ((s, dir) =>
      topK(dedupMax(idxKey(s, dir, "price")), 20, skip = 5)),
    "t3_random_sample" -> ((s, dir) =>
      randomSample(idxKey(s, dir, "status:O"), 100)),

    // ---- TPC-H-style headliners (bench + general relational capability) ----
    "q1_pricing" -> ((s, dir) =>
      Catalog.table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q3_top_orders" -> ((s, dir) => {
      val c = Catalog.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Catalog.table(s, dir, "orders")
      val l = Catalog.table(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),
    "q5_region_revenue" -> ((s, dir) => {
      val r = Catalog.table(s, dir, "region")
      val n = Catalog.table(s, dir, "nation")
      val su = Catalog.table(s, dir, "supplier")
      val l = Catalog.table(s, dir, "lineitem")
      l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("r_name")
    }),

    // ---- Events: tumbling-window aggregation (batch view; SURVEY §2.9) ----
    "ev_daily_counts" -> ((s, dir) =>
      Catalog.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("day", "event_type")),

    // ---- LLM-pipeline: dedup / text analysis / similarity ----
    "dedup_exact" -> ((s, dir) =>
      Catalog.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")),
    "text_stats" -> ((s, dir) =>
      Catalog.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct"),
        round(size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " ")), 4).as("ttr"))),
    "doc_fingerprint" -> ((s, dir) =>
      Catalog.documents(s, dir).select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
          .as("fingerprint"))),
    "emb_topk" -> ((s, dir) => {
      val e = Catalog.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
      val dot = aggregate(zip_with(col("emb"), col("qemb"), _ * _),
        lit(0.0), (acc, v) => acc + v)
      val na = aggregate(transform(col("emb"), x => x * x), lit(0.0), (acc, v) => acc + v)
      val nb = aggregate(transform(col("qemb"), x => x * x), lit(0.0), (acc, v) => acc + v)
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), round(dot / sqrt(na * nb), 6).as("sim"))
        .orderBy(desc("sim"), asc("vec_id"))
        .limit(10)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "s1_keyword_leaf" -> s"$IDX SELECT off, score FROM idx WHERE key = 'price'",
    "s2_key_lookup" -> s"$SUMM SELECT off, 0.0 AS score FROM summ WHERE key = 'order:42'",
    "s3_prefix_scan" -> (s"$IDX SELECT DISTINCT off, 0.0 AS score FROM idx " +
      "WHERE key LIKE 'priority:%' AND lower(key) LIKE '%high%'"),
    "s5_summary_fetch" -> (s"""$IDX, summ AS (
        SELECT o_orderkey AS off, 'order:' || o_orderkey AS key,
               to_json(struct_pack(status := o_orderstatus, price := o_totalprice, priority := o_orderpriority)) AS json
        FROM orders),
      top AS (SELECT off, max(score) AS score FROM idx WHERE key = 'price'
              GROUP BY off ORDER BY score DESC, off LIMIT 25)
      SELECT summ.off AS off, summ.key AS key, summ.json AS json
      FROM top JOIN summ ON top.off = summ.off""".replaceAll("\\s+", " ")),
    "f1_eq" -> s"$IDX SELECT off, score FROM idx WHERE key = 'qty' AND score = 25.0",
    "f2_gt" -> s"$IDX SELECT off, score FROM idx WHERE key = 'price' AND score > 150000.0",
    "f3_le" -> s"$IDX SELECT off, score FROM idx WHERE key = 'price' AND score <= 50000.0",
    // bounds deliberately reversed on the Spark side (scoreRange auto-swaps,
    // query.cc:508-510); oracle uses the normalized order.
    "f4_range" -> s"$IDX SELECT off, score FROM idx WHERE key = 'orderdate' AND score BETWEEN 9500.0 AND 9600.0",
    "j1_or" -> (s"$IDX SELECT off, max(score) AS score FROM idx " +
      "WHERE key IN ('status:F', 'status:O') GROUP BY off"),
    "j2_and" -> (s"$IDX SELECT off, max(score) AS score FROM idx " +
      "WHERE key = 'qty' AND off IN (SELECT off FROM idx WHERE key = 'status:F') GROUP BY off"),
    "j3_subtract" -> (s"$IDX SELECT off, max(score) AS score FROM idx " +
      "WHERE key = 'price' AND off NOT IN (SELECT off FROM idx WHERE key = 'status:F') GROUP BY off"),
    "j4_theta_gt" -> (s"""$IDX,
      rhs AS (SELECT off, max(score) AS rscore FROM idx WHERE key = 'price' GROUP BY off)
      SELECT a.off AS off, max(a.score) AS score
      FROM idx a JOIN rhs ON a.off = rhs.off
      WHERE a.key = 'lineprice' AND a.score > rhs.rscore GROUP BY a.off""".replaceAll("\\s+", " ")),
    "j5_order_by" -> (s"""$IDX,
      rhs AS (SELECT off, max(score) AS rscore FROM idx WHERE key = 'price' GROUP BY off)
      SELECT a.off AS off, max(COALESCE(rhs.rscore, CAST('-infinity' AS DOUBLE))) AS score
      FROM idx a LEFT JOIN rhs ON a.off = rhs.off
      WHERE a.key = 'status:F' GROUP BY a.off""".replaceAll("\\s+", " ")),
    "j6_dedup_min" -> s"$IDX SELECT off, min(score) AS score FROM idx WHERE key = 'qty' GROUP BY off",
    "a1_max" -> s"$IDX SELECT off, max(score) AS score FROM idx WHERE key = 'qty' GROUP BY off",
    "a3_negate" -> s"$IDX SELECT off, -max(score) AS score FROM idx WHERE key = 'price' GROUP BY off",
    "a4_count" -> (s"$IDX SELECT count(*) AS cnt FROM idx WHERE key = 'price' AND score > 100000.0 " +
      "AND off IN (SELECT off FROM idx WHERE key = 'status:O')"),
    "a5_merge_sum" -> s"$IDX SELECT key, off, sum(score) AS score FROM idx WHERE key = 'qty' GROUP BY key, off",
    "a8_key_counts" -> s"$IDX SELECT key, count(*) AS cnt FROM idx GROUP BY key",
    "t1_topk" -> (s"""$IDX,
      d AS (SELECT off, max(score) AS score FROM idx WHERE key = 'price' GROUP BY off)
      SELECT off, score FROM d ORDER BY score DESC, off LIMIT 20 OFFSET 5""".replaceAll("\\s+", " ")),
    "t3_random_sample" -> (s"$IDX SELECT off, score FROM " +
      "(SELECT off, score FROM idx WHERE key = 'status:O' " +
      "ORDER BY md5(CAST(off AS VARCHAR) || ':1234'), off, score LIMIT 100) ORDER BY off, score",
    ),
    "q1_pricing" -> ("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""".replaceAll("\\s+", " ")),
    "q3_top_orders" -> ("""SELECT l_orderkey,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".replaceAll("\\s+", " ")),
    "q5_region_revenue" -> ("""SELECT r_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""".replaceAll("\\s+", " ")),
    "ev_daily_counts" -> ("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")),
    "dedup_exact" -> ("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text)""".replaceAll("\\s+", " ")),
    "text_stats" -> ("""SELECT doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      len(list_distinct(string_split(text, ' '))) AS n_distinct,
      round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
            len(string_split(text, ' ')), 4) AS ttr
      FROM documents""".replaceAll("\\s+", " ")),
    "doc_fingerprint" -> ("""SELECT doc_id,
      md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
      FROM documents""".replaceAll("\\s+", " ")),
    "emb_topk" -> ("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
      SELECT e.vec_id AS vec_id,
        round(list_dot_product(e.emb, q.qemb) /
          sqrt(list_dot_product(e.emb, e.emb) * list_dot_product(q.qemb, q.qemb)), 6) AS sim
      FROM e, q WHERE e.vec_id <> 0
      ORDER BY sim DESC, e.vec_id LIMIT 10""".replaceAll("\\s+", " ")),
  )
}
