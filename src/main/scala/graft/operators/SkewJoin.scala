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
    // deterministic-enough spread: hash of the join key + a per-partition
    // row ordinal; correctness needs no randomness property at all
    val salted = big.withColumn("_salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
