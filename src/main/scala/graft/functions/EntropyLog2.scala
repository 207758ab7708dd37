package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Shannon entropy (log2) of the distribution of a string-valued sensitive
  * attribute — the entropy l-diversity measure (Machanavajjhala et al.,
  * TKDD 2007). Typed `Aggregator` registered via `functions.udaf` — the
  * user-space custom-aggregation API (SURVEY.md §2.7 q44, §4.3).
  *
  * Determinism: the final fold runs over key-sorted counts so the double
  * additions happen in one fixed order on every run/partitioning; the
  * buffer merge itself is a commutative Map merge of exact Longs.
  *
  * Scale: buffer size is bounded by the sensitive-attribute cardinality
  * (binned values, assume ≤1e4 distinct — SURVEY.md §7.5); beyond that,
  * switch to the two-pass groupBy formulation (see q44's oracle SQL, which
  * is exactly that shape).
  */
object EntropyLog2 extends Aggregator[String,
    scala.collection.mutable.HashMap[String, Long], Double] {
  import scala.collection.mutable.HashMap

  // mutable buffer: one hash update per row instead of an immutable
  // Map.updated HAMT rebuild per row (r15 review; MisraGries rationale)
  def zero: HashMap[String, Long] = HashMap.empty

  // NULL inputs are skipped, matching DuckDB's entropy() (which ignores
  // NULLs) — a null category would silently diverge from the oracle.
  def reduce(b: HashMap[String, Long], v: String): HashMap[String, Long] = {
    if (v != null) b.update(v, b.getOrElse(v, 0L) + 1L)
    b
  }

  def merge(a: HashMap[String, Long], b: HashMap[String, Long]): HashMap[String, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  def finish(b: HashMap[String, Long]): Double = {
    val total = b.values.sum.toDouble
    if (total == 0) 0.0
    else {
      // rounding is left to the caller (round(col, 6)) so both engines
      // round the same double the same way
      b.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, n)) =>
        val p = n / total
        acc - p * (math.log(p) / math.log(2.0))
      }
    }
  }

  def bufferEncoder: Encoder[HashMap[String, Long]] =
    Encoders.kryo[HashMap[String, Long]]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
