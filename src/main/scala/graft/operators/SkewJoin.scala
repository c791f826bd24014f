package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew treatment for the case AQE's runtime
  * skew-join split can't reach (a single hot key inside one shuffle
  * partition that must co-locate with a medium-sized build side too big to
  * broadcast). The big side gets a per-row salt in [0, salts); the small
  * side replicates once per salt; joining on (key, salt) spreads each hot
  * key over `salts` reducers instead of funneling it through one.
  *
  * Cost model: small-side shuffle volume × salts, big side unchanged — pick
  * `salts` ≈ the skew factor, not the cluster size. Result is exactly the
  * plain join (salt values never affect matching, only placement), which is
  * what the spec pins.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    // The salt must be DETERMINISTIC per row: a shuffle-stage retry
    // recomputes map output, and a salt derived from partition-dependent
    // state (monotonically_increasing_id, rand) can re-place rows between
    // reducers mid-retry, duplicating or dropping them (SPARK-23207 class).
    // Hashing every big-side column is stable across retries; the SPREAD it
    // buys is a function of how the big side's rows differ WITHIN a hot
    // key, so the caller must keep at least one row-distinguishing non-key
    // column in `big` (a key-only projection degenerates to one salt per
    // key — the salted join still returns the correct result, but the hot
    // key funnels through one reducer again). Fully identical duplicate
    // rows likewise share a salt: cost is spread, never correctness.
    // hash() rejects MapType columns — pre-hash or drop maps first.
    require(big.columns.length > keys.length,
      "saltedJoin: big side must carry a row-distinguishing non-key column" +
        " (a key-only projection yields one salt per key - no spread)")
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
