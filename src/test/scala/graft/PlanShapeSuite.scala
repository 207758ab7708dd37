package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Asserts q48's tokenizer plan is the DISTRIBUTED two-phase rank: no
  * single-partition Exchange anywhere (the round-2 global
  * `Window.orderBy` funneled every distinct identity through one task —
  * a 100 TB scale-killer since identities grow with the data), while the
  * result still equals the naive global dense_rank. */
class PlanShapeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("q48 plan has no single-partition exchange; tokens match global dense_rank") {
    val df = SparkEntry.queries("q48_anon_tokenize")(spark, sf)
    val got = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"q48 still plans a single-partition exchange:\n$plan")

    // positive control: the rejected global-window formulation DOES plan
    // one — proving the string probe detects what it should
    val bad = Tables(spark, sf, "customer").select("c_name").distinct()
      .withColumn("token", dense_rank().over(Window.orderBy("c_name")))
    bad.collect()
    assert(bad.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"),
      "control failed: global-window plan no longer shows a single-partition exchange")

    // semantics unchanged: two-phase rank ≡ dense_rank over distinct names
    val naive = Tables(spark, sf, "customer")
      .join(bad.withColumn("token", col("token").cast("bigint")), "c_name")
      .select("c_custkey", "token").orderBy("c_custkey").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      naive.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
