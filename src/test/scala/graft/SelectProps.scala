package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exec.SelectExec
import graft.model.Tables

/** Randomized pinning of SELECT's pivot semantics against an in-memory
  * transcription of GetFieldValues (select.cc:34-71): selection and fields
  * dedup with MIN; per (row, field) the value is NaN when the field has no
  * posting at the offset, 1.0 when the field's ENTIRE posting list is
  * zero-scored (boolean presence), else the min score. Exercises duplicate
  * offsets, empty fields, all-zero fields, and mixed-zero fields. */
class SelectProps extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fieldValue(field: Seq[(Long, Double)], off: Long): Double = {
    val at = field.filter(_._1 == off)
    if (at.isEmpty) Double.NaN
    else if (field.forall(_._2 == 0.0)) 1.0
    else at.map(_._2).min
  }

  test("all-zero flag is PRE-dedup: {0, nonzero} at one offset stays continuous") {
    // regression for the single-scan collapse (VERDICT r9 #4): a field whose
    // only nonzero score shares an offset with a zero is still CONTINUOUS
    // (select.cc:47-53 checks the raw posting list), even though its
    // dedup-min at that offset is 0 — a post-dedup flag would flip every
    // value to the 1.0 presence rule. Exercised through both the collapsed
    // (2 plain fields) and per-field (1 field) paths.
    val index = Seq(("q", 1L, 0.0), ("q", 2L, 0.0),
      ("f1", 1L, 0.0), ("f1", 1L, 5.0), ("f1", 2L, 0.0),
      ("f2", 1L, 0.0))
    val summaries = Seq((1L, "d1", "{}"), (2L, "d2", "{}"))
    val t = Tables(index.toDF("key", "off", "score"),
      summaries.toDF("off", "key", "json"),
      Seq.empty[(String, String)].toDF("key", "json"))
    for (sql <- Seq("SELECT 'f1', 'f2' FROM 'q';", "SELECT 'f1' FROM 'q';")) {
      val got = SelectExec.run(spark, t, sql).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got("d1") == 0.0, s"$sql: off 1 must be the min 0.0, not 1.0")
      assert(got("d2") == 0.0, s"$sql: off 2 must be the min 0.0, not 1.0")
    }
  }

  test("SELECT pivot matches the in-memory reference transcription") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 6) {
      val from = Seq.fill(10 + rnd.nextInt(20))(
        (rnd.nextInt(15).toLong, rnd.nextInt(5).toDouble))
      def mkField(): Seq[(Long, Double)] = rnd.nextInt(4) match {
        case 0 => Seq.empty // empty field: all NaN
        case 1 => Seq.fill(5 + rnd.nextInt(10))(
          (rnd.nextInt(15).toLong, 0.0)) // boolean (all-zero)
        case _ => Seq.fill(5 + rnd.nextInt(10))(
          (rnd.nextInt(15).toLong, rnd.nextInt(6).toDouble)) // continuous
      }
      val f1 = mkField()
      val f2 = mkField()

      val index = from.map { case (o, s) => ("q", o, s) } ++
        f1.map { case (o, s) => ("f1", o, s) } ++
        f2.map { case (o, s) => ("f2", o, s) }
      val summaries = (0L to 14L).map(o => (o, s"d$o", "{}"))
      val t = Tables(index.toDF("key", "off", "score"),
        summaries.toDF("off", "key", "json"),
        Seq.empty[(String, String)].toDF("key", "json"))

      val got = SelectExec.run(spark, t, "SELECT 'f1', 'f2' FROM 'q';")
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

      val selOffs = from.map(_._1).distinct
      assert(got.size == selOffs.size, s"trial $trial row count")
      for (off <- selOffs) {
        val (g1, g2) = got(s"d$off")
        val (w1, w2) = (fieldValue(f1, off), fieldValue(f2, off))
        def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b
        assert(eq(g1, w1) && eq(g2, w2),
          s"trial $trial off=$off got=($g1,$g2) want=($w1,$w2)")
      }
    }
  }
}
