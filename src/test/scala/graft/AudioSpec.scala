package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Multimodal

class AudioSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.map { case (id, t) =>
    (id, t, "en", "s0", t.length.toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val F = Multimodal.AudioFrame

  test("constant-sample frames score exactly F times the square") {
    // 16 spaces (0x20 = 32): energy = 16 * 32² = 16384, silent (< 16·60²)
    // 16 tildes (0x7e = 126): energy = 16 * 126² = 254016, active
    val d = docs(Seq(1L -> (" " * F), 2L -> ("~" * F)))
    val got = Multimodal.audioEnergy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (F.toLong * 32 * 32, true),
      2L -> (F.toLong * 126 * 126, false)))
  }

  test("tail samples short of a full frame are truncated; short docs drop") {
    val d = docs(Seq(1L -> ("a" * (2 * F + 7)), 2L -> ("b" * (F - 1))))
    val frames = Multimodal.audioEnergy(d).collect()
    assert(frames.map(_.getLong(0)).toSet == Set(1L))
    assert(frames.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L))
  }

  test("non-printable bytes are stripped before framing") {
    // 8 bells + 16 tildes: the planted PCM is the 16 tildes only
    val d = docs(Seq(1L -> ("\u0007" * 8 + "~" * F)))
    val frames = Multimodal.audioEnergy(d).collect()
    assert(frames.length == 1 &&
      frames.head.getLong(2) == F.toLong * 126 * 126)
  }

  test("trim reports the active window; all-silent docs trim to zero") {
    // silent, active, silent, active, silent frames
    val t = (" " * F) + ("~" * F) + (" " * F) + ("~" * F) + (" " * F)
    val d = docs(Seq(1L -> t, 2L -> (" " * (3 * F))))
    val got = Multimodal.audioTrim(d).collect().map(r =>
      r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got(1L) == (5L, 3L, 1L, 3L, 3L))
    assert(got(2L) == (3L, 3L, -1L, -1L, 0L))
  }
}
