package graft

import graft.plans.LevenshteinPrefilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom optimizer rule executing: LevenshteinPrefilter must inject
  * the O(1) length lower-bound ahead of the O(n·m) edit-distance filter,
  * preserve results exactly, and stay idempotent under the optimizer's
  * fixed-point batches. (The source is a `range`, not a local Seq — a
  * LocalRelation would be constant-folded away before the plan can be
  * inspected.) */
class PlanRuleSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = spark.range(0, 200).select(
    concat(lit("name"), col("id").cast("string")).as("a"),
    lit("name5").as("b"))

  test("levenshtein threshold filters gain a short-circuit length bound") {
    val baseline = corpus.filter(expr("levenshtein(a, b) <= 2"))
      .collect().map(_.getString(0)).toSet
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LevenshteinPrefilter
    try {
      val q = corpus.filter(expr("levenshtein(a, b) <= 2"))
      val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("abs(") && opt.contains("length("),
        s"length bound not injected:\n$opt")
      // the guard is injected exactly once (idempotent under fixed point)
      assert("abs\\(".r.findAllIn(opt).size == 1, s"guard duplicated:\n$opt")
      // semantics preserved vs the un-optimized run
      assert(q.collect().map(_.getString(0)).toSet == baseline)
      // strict variant: < 1 means identical strings only
      val q2 = corpus.filter(expr("levenshtein(a, b) < 1"))
      assert(q2.collect().map(_.getString(0)).toSeq == Seq("name5"))
      assert("abs\\(".r.findAllIn(
        q2.queryExecution.optimizedPlan.toString.toLowerCase).size == 1)
      // reversed comparison gets the guard too
      val q3 = corpus.filter(expr("2 >= levenshtein(a, b)"))
      assert(q3.collect().map(_.getString(0)).toSet == baseline)
      assert("abs\\(".r.findAllIn(
        q3.queryExecution.optimizedPlan.toString.toLowerCase).size == 1)
    } finally spark.experimental.extraOptimizations = prev
  }
}
