package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k aggregator: the map-side-combining alternative to
  * the rank-window idiom (`row_number().over(partitionBy(g).orderBy(s))
  * ... filter(rn <= k)`), which SORTS every group's full row set inside
  * each shuffle partition before discarding all but k rows. This
  * Aggregator keeps the k best (score, id) pairs per group as it goes:
  * partial state is O(k) per group per map task, the shuffle carries at
  * most k pairs per (task, group) instead of every row, and no sort of
  * the full group ever happens — at 100 TB with heavy groups, the
  * difference between a spilling sort and a few KB of state.
  *
  * Determinism: the ordering is TOTAL — (score desc, id asc), id unique
  * by contract — so reduce/merge are associative+commutative up to the
  * kept set (merging two top-k lists and truncating yields the global
  * top-k of the union regardless of merge tree; the classic mergeable-
  * summary argument). Ties in score resolve by id on every path,
  * satisfying §2.9 R5. Totality includes NaN (r15 review: the naive
  * `>`/`==` form was NOT total under NaN — merge results depended on
  * Spark's nondeterministic partial-merge order and the sorted-buffer
  * invariant broke): NaN ranks GREATEST, matching Spark's and DuckDB's
  * sort semantics for the window idiom this replaces, and ±0.0 compare
  * equal (IEEE ==, the oracle's ORDER BY), falling through to the id
  * tiebreak.
  *
  * Inputs are NON-NULL by contract (the facade filters; a primitive
  * (Double, Long) encoder would throw on NULL, not skip).
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"TopKByScore: k must be positive, got $k")

  /** (score desc, id asc) — strict TOTAL order for every double. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(norm(a._1), norm(b._1))
    cmp > 0 || (cmp == 0 && a._2 < b._2)
  }
  /** Collapse -0.0 onto 0.0 so Double.compare (which separates them)
    * agrees with IEEE == and both engines' ORDER BY on signed zeros. */
  private def norm(s: Double): Double = if (s == 0.0) 0.0 else s

  def zero: List[(Double, Long)] = Nil

  def reduce(b: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
    // insert into the (short, k-bounded) sorted list; drop the overflow
    val (above, below) = b.span(better(_, v))
    val merged = above ::: v :: below
    if (merged.length > k) merged.take(k) else merged
  }

  def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    // merge of two sorted lists, truncated — O(k), order-insensitive
    val out = scala.collection.mutable.ListBuffer.empty[(Double, Long)]
    var (x, y) = (a, b)
    while (out.length < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out.toList
  }

  def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  def bufferEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo[List[(Double, Long)]]
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
}
