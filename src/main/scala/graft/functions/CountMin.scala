package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the point-frequency companion to the Misra–Gries summary: MG answers
  * "which items are frequent" with a k-bounded item list; CM answers
  * "how often did THIS item occur" for any item, from depth×width
  * integer cells, never storing items at all. The guarantees are
  * one-sided: est ≥ true always (cells only ever add), and
  * est ≤ true + εN with probability ≥ 1 − (1/2)^depth for ε = e/width
  * (each row overshoots by N/width in expectation; the min over
  * independent rows kills outliers).
  *
  * Determinism (the q14/q111 sketch-family requirement): unlike sampled
  * or RNG-seeded sketches, CM is exactly order-insensitive — `reduce`
  * is integer increments and `merge` element-wise integer sum, both
  * commutative/associative, so Spark's partial-merge order cannot
  * change a single cell. Same data ⇒ bit-identical sketch on any merge
  * tree (SketchSuite proves the merge identity on a real split).
  *
  * Hashing: Kirsch–Mitzenmacher double hashing (two MurmurHash3 string
  * hashes with fixed seeds; row i probes floorMod(h1 + i·h2, width)) —
  * pure JVM arithmetic, identical on every executor. [[CountMin.positions]]
  * is shared with query-side probe compilation: a STATIC probe word's
  * cell indexes are Scala-side constants, so estimates read back as
  * codegen'd `element_at(sketch, literal)` min-folds — no UDF at query
  * time.
  *
  * Scale: state is depth×width longs (the default 4×1024 = 32 KB)
  * regardless of stream length or item cardinality; map-side combines
  * like any typed Aggregator. The exact groupBy(word) alternative
  * shuffles the whole token universe to answer the same point query.
  */
class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, s"CountMin: depth/width must be positive, got $depth x $width")

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(b: Array[Long], v: String): Array[Long] = {
    if (v != null) {
      val pos = CountMin.positions(v, depth, width)
      var i = 0
      while (i < depth) { b(i * width + pos(i)) += 1L; i += 1 }
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Fixed seeds — part of the sketch identity: two sketches are only
    * mergeable/comparable when depth, width, AND seeds agree. */
  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x5bd1e995

  /** Row-i cell offsets for item `v` (within-row index; cell i lives at
    * flat index i*width + positions(i)). Used by both the Aggregator's
    * reduce and driver-side probe compilation. */
  def positions(v: String, depth: Int, width: Int): Array[Int] = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(v, Seed1)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(v, Seed2)
    Array.tabulate(depth)(i => math.floorMod(h1.toLong + i.toLong * h2.toLong, width.toLong).toInt)
  }
}
