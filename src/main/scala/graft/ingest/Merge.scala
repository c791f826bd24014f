package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9/A5-A7 — k-way merge of table generations
  * (/root/reference/src/merge.cc:120-184; modes src/ca-load.cc:409-541).
  * The reference heap-merges N sorted files; here a union + hash groupBy on
  * (key, off) is the shuffle-native equivalent — same result, and the
  * partial (map-side) aggregation Spark inserts replaces the heap's
  * streaming property at scale.
  */
object Merge {

  private val pctCols = Seq("pct5", "pct25", "pct75", "pct95")

  /** Ensure percentile columns exist (null when a generation lacks them). */
  private def withPcts(df: DataFrame): DataFrame =
    pctCols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("double")))

  private def unioned(gens: Seq[DataFrame]): DataFrame =
    gens.map(g => withPcts(g)
      .select((Seq("key", "off", "score") ++ pctCols).map(col): _*))
      .reduce(_ unionByName _)

  /** A5 merge-mode `sum`: same (key, off) → scores added
    * (ca-load.cc:490-494). Percentiles dropped (the reference only sums plain
    * scores). */
  def sum(gens: Seq[DataFrame]): DataFrame =
    unioned(gens).groupBy("key", "off")
      .agg(org.apache.spark.sql.functions.sum("score").as("score"))

  /** A6 merge-mode `union`: duplicate (key, off) must agree on score —
    * assert-equal (ca-load.cc:477-481). The check is declarative:
    * raise_error fires at execution when generations disagree. NULL
    * counts as a conflicting value: countDistinct ignores NULLs, so a
    * NULL-vs-value pair would otherwise pass as "agreed" and silently
    * emit the non-NULL score where the reference's assert-equal errors
    * (review finding, r19); count(*) vs count(score) detects the mix.
    * All-NULL duplicates agree (on NULL) and emit NULL. */
  def union(gens: Seq[DataFrame]): DataFrame =
    unioned(gens).groupBy("key", "off")
      .agg(min("score").as("score"),
        countDistinct("score").as("n_scores"),
        count(lit(1)).as("n_rows"),
        count("score").as("n_nonnull"))
      .select(col("key"), col("off"),
        when(col("n_scores") > 1 ||
            (col("n_nonnull") > 0 && col("n_nonnull") < col("n_rows")),
          raise_error(concat(lit("merge-mode union: conflicting scores for key="),
            col("key"), lit(" off="), col("off"))).cast("double"))
          .otherwise(col("score")).as("score"))

  /** A7 merge-mode `pick-one`: keep one value per (key, off), preferring a
    * value WITHOUT percentile bands over one with (ca-load.cc:482-489 keeps
    * the first encountered with that preference; file order is not a stable
    * contract under parallel reads, so we pin the deterministic winner:
    * non-percentile first, then lowest score). */
  def pickOne(gens: Seq[DataFrame]): DataFrame =
    unioned(gens)
      .withColumn("has_pct", col("pct5").isNotNull.cast("int"))
      .groupBy("key", "off")
      .agg(min(struct(col("has_pct"), col("score"),
        col("pct5"), col("pct25"), col("pct75"), col("pct95"))).as("w"))
      .select(col("key"), col("off"), col("w.score").as("score"),
        (col("w.has_pct") === 1).as("has_pct"))
}
