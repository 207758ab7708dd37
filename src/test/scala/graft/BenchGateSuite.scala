package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[Bench.computeRegressionFlags]] — the tripwire that r15
  * proved works (it flagged the one real driver-run anomaly) and r16
  * promoted to a strict-mode gate — with fabricated history lines, so
  * the gate path itself is covered (VERDICT r15 item 5). */
class BenchGateSuite extends AnyFunSuite {
  private val sfDir = "/data/sf0.1"
  private def line(queries: Seq[(String, Double)], failed: Seq[String] = Nil,
      dir: String = sfDir): String =
    s"""{"metric":"total","value":1.0,"unit":"sec","failed":${failed.size},""" +
      s""""failed_queries":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""queries":${queries.map { case (n, v) => s""""$n":$v""" }
        .mkString("{", ",", "}")},"sf":0.1,"sf_dir":"$dir"}"""

  private val cleanHist =
    Seq.fill(3)(line(Seq("q_a" -> 0.10, "q_b" -> 1.00)))

  test("a >3x, >0.3s reading over 3 healthy history runs is flagged") {
    val flags = Bench.computeRegressionFlags(cleanHist, sfDir,
      Map("q_a" -> 0.90, "q_b" -> 1.05), Set.empty)
    assert(flags == Seq("q_a"))
  }

  test("the 0.3s absolute floor suppresses sub-threshold jitter") {
    val flags = Bench.computeRegressionFlags(cleanHist, sfDir,
      Map("q_a" -> 0.29, "q_b" -> 1.0), Set.empty)
    assert(flags.isEmpty, "0.10->0.29 is jitter, not a regression")
  }

  test("a query that FAILED this run is excluded (time-to-throw)") {
    val flags = Bench.computeRegressionFlags(cleanHist, sfDir,
      Map("q_a" -> 5.0), Set("q_a"))
    assert(flags.isEmpty)
  }

  test("historical failed runs don't feed the baseline (just-fixed query)") {
    // q_a failed in all 3 prior runs with a fast time-to-throw; its first
    // healthy run is SLOWER than the bogus baseline but must not flag
    val hist = Seq.fill(3)(line(Seq("q_a" -> 0.05), failed = Seq("q_a")))
    val flags = Bench.computeRegressionFlags(hist, sfDir,
      Map("q_a" -> 0.9), Set.empty)
    assert(flags.isEmpty, "time-to-throw history must not act as a baseline")
  }

  test("fewer than 3 same-sf_dir history runs -> no flags (cold start)") {
    val mixed = Seq(line(Seq("q_a" -> 0.1)), line(Seq("q_a" -> 0.1)),
      line(Seq("q_a" -> 0.1), dir = "/data/sf0.01"))
    val flags = Bench.computeRegressionFlags(mixed, sfDir,
      Map("q_a" -> 0.9), Set.empty)
    assert(flags.isEmpty)
  }

  test("trailing MEDIAN is the baseline, not the min or mean") {
    // history 0.1, 0.1, 10.0 (one historical spike): median 0.1 -> a
    // current 0.9 still flags; were the baseline the mean (~3.4) it would
    // not. Guards against a past transient poisoning future baselines.
    val hist = Seq(line(Seq("q_a" -> 0.1)), line(Seq("q_a" -> 0.1)),
      line(Seq("q_a" -> 10.0)))
    val flags = Bench.computeRegressionFlags(hist, sfDir,
      Map("q_a" -> 0.9), Set.empty)
    assert(flags == Seq("q_a"))
  }
}
