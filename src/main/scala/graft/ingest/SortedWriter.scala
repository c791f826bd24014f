package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** T4/S11 — the sorted-table write invariant
  * (/root/reference/src/table-backend-writeonce.cc:661-663: keys strictly
  * ascending; src/ca-load.cc:217-219: postings stable-sorted by offset) and
  * table copy with shard/prefix rewrites (ca-load.cc:543-568,593-703).
  *
  * Parquet + repartition(key) + sortWithinPartitions(key, off) reproduces the
  * invariant: each key's postings land in one file, sorted — row-group
  * min/max stats then serve point lookups the way the reference's block
  * last-key index does.
  */
object SortedWriter {

  /** Write postings sorted by (key, off); one file per key when shards == 0,
    * else `shards` hash-sharded files (ca-load.cc --shard-count). */
  def write(postings: DataFrame, path: String, shards: Int = 0): Unit = {
    val parted =
      if (shards > 0)
        postings.repartition(shards, Funcs.shardOf(col("key"), shards))
      else postings.repartition(col("key"))
    parted.sortWithinPartitions("key", "off")
      .write.mode("overwrite").parquet(path)
  }

  /** S11 — copy with rewrites: optional regex key filter, strip/add key
    * prefix, score threshold (ca-load.cc:543-568,181-231). */
  def copy(postings: DataFrame, path: String,
      keyFilter: Option[String] = None,
      stripPrefix: Option[String] = None,
      addPrefix: Option[String] = None,
      minScore: Option[Double] = None,
      shards: Int = 0): Unit = {
    var df = postings
    keyFilter.foreach(re => df = df.filter(col("key").rlike(re)))
    stripPrefix.foreach(p =>
      df = df.filter(col("key").startsWith(p))
        .withColumn("key", expr(s"substring(key, ${p.length + 1})")))
    addPrefix.foreach(p => df = df.withColumn("key", concat(lit(p), col("key"))))
    minScore.foreach(t => df = df.filter(col("score") >= t))
    write(df, path, shards)
  }
}
