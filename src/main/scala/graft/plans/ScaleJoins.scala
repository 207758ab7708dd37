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
    * The salt is a DETERMINISTIC function of the whole left row (hash of
    * every column): a nondeterministic salt (e.g. one derived from
    * `monotonically_increasing_id`) feeding a shuffle means a retried map
    * task can re-salt a row into a different partition than the one some
    * reducers already fetched — duplicating or dropping it (the classic
    * repartition-nondeterminism failure). The trade-off: byte-identical
    * duplicate rows share a salt bucket; acceptable, since skew in
    * practice comes from many distinct rows sharing a KEY, which still
    * spread by their non-key columns.
    *
    * Semantically identical to `left.join(right, leftKey === rightKey)`.
    * `left` must not already contain a `graft_salt` column.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    require(!left.columns.contains("graft_salt") && !right.columns.contains("graft_salt"),
      "graft_salt is reserved by saltedJoin")
    val salted = left.withColumn("graft_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }
}
