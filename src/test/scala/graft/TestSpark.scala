package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for all specs (getOrCreate — tests fork once). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("4")

  def postingsDf(p: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    p.toDF("off", "score")
  }

  /** Collect a posting DataFrame to a multiset for exact comparison. */
  def multiset(df: DataFrame): Map[(Long, Double), Int] =
    df.collect()
      .map(r => (r.getLong(r.fieldIndex("off")), r.getDouble(r.fieldIndex("score"))))
      .groupBy(identity).view.mapValues(_.length).toMap

  def multiset(p: Seq[(Long, Double)]): Map[(Long, Double), Int] =
    p.groupBy(identity).view.mapValues(_.length).toMap
}
