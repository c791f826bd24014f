package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Pins the committed bench ARTIFACTS' contract (VERDICT r19 #2/#3/#7):
  * every ambient-vs-structural drift call must be decidable from files in
  * the repo, which means (a) the contended artifact covers every entry
  * that has ever run ≥1 s quiet, (b) a standing isolated-reps artifact
  * covers the driver's top-task_ms entries with cheap controls, and
  * (c) both carry the ambient-load and commit stamps that make them
  * attributable to the exact tree they measured. A red test here means a
  * source change landed without refreshing the artifact it invalidates —
  * rerun scripts/contended_bench.sh / scripts/isolated_bench.sh. */
class BenchArtifactsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def readArtifact(name: String): JsonNode = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing — run scripts/")
    mapper.readTree(java.nio.file.Files.readString(p))
  }

  private def queryNames(n: JsonNode): Set[String] = {
    val it = n.get("queries").fieldNames()
    Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toSet
  }

  test("gitCommit: self-attributing token (hash, optionally -dirty)") {
    val c = Bench.gitCommit()
    assert(c == "unknown" || c.matches("[0-9a-f]{7,40}(-dirty)?"), c)
    val line = Bench.guardedLine(
      scala.collection.immutable.ListMap("q" -> (1.0, true)), reps = 3,
      sfDir = "/sf", extra = s""","commit":${Bench.jstr(c)}""")
    assert(line.contains(""""commit":""""), line)
  }

  test("bench_isolated.json: reps=5 quiet, top-task_ms family + controls, " +
      "stamped with load1 + commit") {
    val a = readArtifact("bench_isolated.json")
    assert(a.get("reps").asInt() == 5)
    assert(a.get("contended").asBoolean() == false)
    assert(a.get("errors").asInt() == 0)
    assert(a.get("load1").isNumber)
    assert(a.get("commit").asText().nonEmpty)
    val want = Set("decontaminate_fuzzy", "source_overlap", "dedup_simhash",
      "lm_stream_scores", "span_dedup", "ql_dockey_or", "s1_keyword_leaf")
    val got = queryNames(a)
    assert(want.subsetOf(got), s"missing: ${want -- got}")
  }

  test("bench_last.json: full-precision quiet record parses, carries the " +
      "ambient + commit stamps and the per-entry counters") {
    val a = readArtifact("bench_last.json")
    assert(a.get("load1").isNumber)
    assert(a.get("commit").asText().nonEmpty)
    assert(a.get("counters") != null && a.get("counters").isObject)
  }

  test("bench_contended.json: contended flag set, covers the ≥1s-quiet " +
      "tail incl. the r20 additions, stamped with load1 + commit") {
    val a = readArtifact("bench_contended.json")
    assert(a.get("contended").asBoolean() == true)
    assert(a.get("load1").isNumber)
    assert(a.get("commit").asText().nonEmpty)
    // the r20-added tail (VERDICT r19 #2) — dedup_simhash was the one
    // drifted entry with no pre-decided arbiter
    val want = Set("dedup_simhash", "dedup_winnow", "lm_stream_scores",
      "j1_or", "merge_union", "ql_theta_query", "decontaminate_fuzzy")
    val got = queryNames(a)
    assert(want.subsetOf(got), s"missing: ${want -- got}")
  }
}
