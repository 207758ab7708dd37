package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that break at 100 TB (SURVEY.md §7.5):
  * key skew and repeated co-located joins. AQE's skew-split handles most
  * skew at runtime; [[saltedJoin]] is the explicit fallback when one key
  * dominates so heavily that even split partitions of it overwhelm a task
  * (or when AQE is off). Bucketing (exercised in ScaleJoinsSuite via
  * `bucketBy` tables) removes the shuffle entirely for joins repeated on
  * the same key — the right layout for a fact table joined daily.
  */
object ScaleJoins {

  /** Salted inner equi-join of a skewed LEFT side against a smaller RIGHT
    * side: the left's hot keys spread over `saltBuckets` partitions; the
    * right side replicates once per salt (explode of a literal range —
    * cheap when right ≪ left, the usual skew shape).
    *
    * Semantically identical to `left.join(right, leftKey === rightKey)`.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = left.withColumn("graft_salt",
      pmod(hash(leftKey, monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }
}
