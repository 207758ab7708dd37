package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries, Sci. Comp. Prog.
  * 1982; mergeable form Agarwal et al., PODS 2012) — the frequent-items
  * primitive the built-in surface lacks (`df.stat.freqItems` gives no
  * error bound and no mergeable state): a k-counter summary such that
  * every item with true frequency f appears with estimate
  * f − n/(k+1) ≤ est ≤ f, so any item with f > n/(k+1) is guaranteed
  * present.
  *
  * Determinism under Spark's nondeterministic partial-merge ORDER is the
  * design constraint here: classic MG merge (sum, then subtract the
  * (k+1)-th largest) is order-SENSITIVE, so this Aggregator truncates
  * only in `reduce` — each partition builds its own k-bounded summary
  * over its deterministic row order — while `merge` is the EXACT
  * commutative/associative map sum. Buffer size is bounded by
  * k × #partials (k·32 here), the estimates are reproducible on any
  * merge tree, and the per-partition error bounds still telescope:
  * total undercount ≤ Σ_p n_p/(k+1) = n/(k+1).
  *
  * Scale: the summary map-side combines like any typed Aggregator; state
  * is O(k·partitions) — KBs — regardless of corpus size. The decrement
  * step is O(k) but only fires when a full summary meets a novel item
  * (long-tail text: rarely), amortized O(1) per row.
  */
class MisraGries(k: Int) extends Aggregator[String,
    scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
  import scala.collection.mutable.HashMap

  // The buffer is a MUTABLE HashMap (r15 review): reduce runs once per
  // exploded token over the whole corpus, and the previous immutable
  // Map.updated rebuilt O(log k) HAMT spine nodes plus a boxed Long on
  // EVERY row — pure allocation on the hot path the q123 scaladoc
  // itself calls the dominant cost at scale. Aggregator buffers are
  // private to their partial (Spark's typed-agg contract: mutate and
  // return), and the buffer stays kryo-encoded opaque state, so the
  // determinism argument is unchanged.
  def zero: HashMap[String, Long] = HashMap.empty

  def reduce(b: HashMap[String, Long], v: String): HashMap[String, Long] = {
    if (v != null) b.get(v) match {
      case Some(n) => b.update(v, n + 1L)
      case None if b.size < k => b.update(v, 1L)
      case None => // decrement-all: the arriving item cancels one of each
        // snapshot the keys — removal during iteration is undefined, and
        // this branch is the rare one (amortized O(1) per row, class doc)
        b.keysIterator.toArray.foreach { key =>
          val n = b(key)
          if (n > 1L) b.update(key, n - 1L) else b.remove(key)
        }
    }
    b
  }

  /** Exact map sum — commutative and associative, so Spark's partial
    * merge order can't change the result (see class doc). */
  def merge(a: HashMap[String, Long], b: HashMap[String, Long]): HashMap[String, Long] = {
    b.foreach { case (key, n) => a.update(key, a.getOrElse(key, 0L) + n) }
    a
  }

  def finish(b: HashMap[String, Long]): Map[String, Long] = b.toMap

  // buffer is opaque engine state → kryo; output must be a real SQL
  // map<string,bigint> so the query can explode it → ExpressionEncoder
  def bufferEncoder: Encoder[HashMap[String, Long]] =
    Encoders.kryo[HashMap[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
