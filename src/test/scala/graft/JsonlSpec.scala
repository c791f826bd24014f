package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.JsonlLoader

/** JSONL ingest laws: the write→read round trip is exact for the string
  * content a real corpus carries (quotes, backslashes, control characters,
  * non-ASCII), nulls survive, and a malformed line is an ingest-time
  * ERROR (FAILFAST), never a silent null row. */
class JsonlSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_jsonl_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("round trip is exact for quotes, backslashes, control chars, " +
    "unicode, and nulls") {
    val rows = Seq(
      (1L, "plain text", "en", "s0", 10L),
      (2L, "a \"quoted\" \\ backslash", "en", "s0", 22L),
      (3L, "tab\there newline\nthere cr\rend", "de", "s1", 29L),
      (4L, "emoji 😀 and café", "fr", "s1", 14L),
      (5L, null, null, "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp("rt")
    rows.write.mode("overwrite").json(dir)
    val back = JsonlLoader.documents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = rows.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(back == want)
  }

  test("a malformed line fails the read (FAILFAST), not a silent null") {
    val dir = tmp("bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{not json at all""".stripMargin)
    val e = intercept[org.apache.spark.SparkException] {
      JsonlLoader.documents(spark, dir).collect()
    }
    assert(e.getMessage != null)
  }
}
