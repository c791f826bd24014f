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

  /** Write postings sorted by (key, off); hash-partitioned by key when
    * shards == 0, else `shards` ADDRESSABLE hash shards
    * (ca-load.cc --shard-count): a hive `shard=<id>/` directory per shard
    * id, each holding that shard's postings sorted. The former
    * `repartition(shards, shardOf)` re-hashed the computed shard id
    * through the murmur3 partitioner, so output files neither
    * corresponded to shardOf(key) nor numbered `shards` (two ids could
    * collide into one file — review finding, r19); the partitionBy layout
    * makes shard `i` the directory a consumer selects by id, which is the
    * reference's shard-file contract. */
  def write(postings: DataFrame, path: String, shards: Int = 0): Unit =
    if (shards > 0)
      postings.withColumn("shard", Funcs.shardOf(col("key"), shards))
        .repartition(col("shard"))
        .sortWithinPartitions("shard", "key", "off")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    else
      postings.repartition(col("key"))
        .sortWithinPartitions("key", "off")
        .write.mode("overwrite").parquet(path)

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
