package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/** Pins the Bench stdout-line contract: the driver captures only the last
  * 2000 chars of stdout, so the JSON line must stay ≤1700 chars at ANY query
  * count, dropping the fastest queries first and reporting the omission —
  * the guard whose absence produced BENCH_r05/r06's "parsed": null. */
class BenchLineSpec extends AnyFunSuite {

  private def fake(n: Int): ListMap[String, (Double, Boolean)] =
    ListMap.from((1 to n).map(i =>
      f"benchmark_query_with_a_long_name_$i%03d" -> (i * 0.01, true)))

  test("compact: 2 decimals, trailing zeros stripped, locale-proof") {
    assert(Bench.compact(0.494999) == "0.49")
    assert(Bench.compact(2.0) == "2")
    assert(Bench.compact(1.5) == "1.5")
    assert(Bench.compact(0.0) == "0")
    // NOTE: swaps the JVM-GLOBAL default locale — safe only because the
    // suites run sequentially (build.sbt does not enable parallel test
    // execution); if that ever changes, move this to an explicit
    // String.format(locale, …) harness instead of the global default.
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY) // would render 0,49
    try assert(Bench.compact(0.49) == "0.49")
    finally java.util.Locale.setDefault(prev)
  }

  test("bench line stays valid JSON when sfDir contains quotes/backslashes") {
    val line = Bench.guardedLine(fake(3), reps = 1,
      sfDir = "/tmp/we\"ird\\path")
    assert(line.contains("\"sf\":\"/tmp/we\\\"ird\\\\path\""), line)
    // no unescaped quote sequence survives
    assert(!line.contains("\"/tmp/we\"ird"), line)
  }

  test("guard keeps the line ≤1700 chars at any query count") {
    for (n <- Seq(10, 106, 150, 400)) {
      val line = Bench.guardedLine(fake(n), reps = 3, sfDir = "/sf")
      assert(line.length <= 1700, s"n=$n line=${line.length} chars")
      assert(line.startsWith("{\"metric\":\"total\""), s"n=$n")
      assert(line.endsWith("}"), s"n=$n")
    }
  }

  test("guard drops the FASTEST queries first and reports the omission") {
    val n = 400
    val line = Bench.guardedLine(fake(n), reps = 3, sfDir = "/sf")
    assert(line.contains("\"queries_omitted\":"))
    // the slowest query must survive; the fastest must be the first dropped
    assert(line.contains(f"benchmark_query_with_a_long_name_$n%03d"))
    assert(!line.contains("benchmark_query_with_a_long_name_001"))
    // total still reflects ALL queries, not just the kept ones
    val want = Bench.compact((1 to n).map(_ * 0.01).sum)
    assert(line.contains(s""""value":$want"""))
  }

  test("small runs keep the full per-query map with no omission marker") {
    val line = Bench.guardedLine(fake(5), reps = 3, sfDir = "/sf")
    assert(!line.contains("queries_omitted"))
    for (i <- 1 to 5)
      assert(line.contains(f"benchmark_query_with_a_long_name_$i%03d"))
  }

  test("ambient-load fragment: load1 + contended flag render as valid " +
      "JSON fields and survive the length guard (VERDICT r18 #7)") {
    val frag = Bench.loadFragment(1.537, contended = false)
    assert(frag == ""","load1":1.54,"contended":false""", frag)
    // JVM-unreadable loadavg renders as -1.00, still valid JSON
    assert(Bench.loadFragment(-1.0, contended = true)
      == ""","load1":-1.00,"contended":true""")
    // the fragment rides `extra`, which every guarded rendering keeps —
    // even the degenerate all-queries-omitted one
    val line = Bench.guardedLine(fake(400), reps = 3, sfDir = "/sf",
      extra = frag)
    assert(line.length <= 1700)
    assert(line.contains(""""load1":1.54,"contended":false"""), line)
  }

  test("errored queries render as err objects and are never dropped early") {
    val rs = ListMap("ok_q" -> (1.0, true), "bad_q" -> (99.9, false))
    val line = Bench.guardedLine(rs, reps = 3, sfDir = "/sf")
    assert(line.contains(""""bad_q":{"sec":99.9,"err":true}"""))
    assert(line.contains(""""errors":1"""))
    // err contributes 0 to total
    assert(line.contains(""""value":1"""))
  }
}
