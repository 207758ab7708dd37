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
    // hash() rejects MapType (anywhere in the type tree) since Spark 3 —
    // salting must skip unhashable columns rather than throw where the
    // plain join would have worked (r15 review). A frame with NO
    // hashable column degenerates to salt 0: still correct, just
    // unspread (and such a frame has no join key to be skewed on).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltSrc = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val salted = left.withColumn("graft_salt",
      if (saltSrc.nonEmpty) pmod(hash(saltSrc.toIndexedSeq: _*), lit(saltBuckets))
      else lit(0))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated,
        leftKey === rightKey && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }

  /** Bloom-filter semi-join prefilter: returns `fact` restricted to rows
    * whose `factKey` MIGHT appear in `dimKeys` (single-column frame) —
    * no false negatives, a controlled false-positive rate the downstream
    * exact join removes. This is the reduction behind runtime row-level
    * filtering: when the dim side is too large to broadcast as a hash
    * relation but the JOIN is selective on the fact, its key set
    * compresses to a fixed `bits`-bit mask (8 KB at the default 2¹⁶)
    * that broadcasts at ANY dim cardinality, and non-matching fact rows
    * die map-side BEFORE the shuffle — the wire carries only rows that
    * (almost always) survive the join.
    *
    * Construction: Kirsch–Mitzenmacher double hashing — two xxhash64
    * draws (the second salted with a constant column) reduced mod
    * `bits`, probe i at (h1 + i·h2) mod bits. Both hashes are reduced
    * BEFORE combining so position arithmetic stays < 2³¹ (Spark 4 ANSI
    * mode throws on long overflow — raw h1 + i·h2 can wrap). The mask
    * aggregates as 64-bit words via map-side-combined bit_or, ships as
    * ONE map<word→bits> row, and the membership test is pure codegen'd
    * bit arithmetic (`try_element_at` + shift/and — absent word = no
    * bits set). Deterministic: same keys ⇒ same mask ⇒ same kept rows,
    * and the final joined result is EXACTLY the unfiltered join's.
    *
    * FPR ≈ (1 − e^(−kn/m))^k: at the defaults (m = 65536, k = 5) a
    * 3 000-key dim loads 21% of the bits for FPR ≈ 0.03%. Size `bits`
    * to the dim's key cardinality at scale; the mask stays ≤ m/8 bytes.
    */
  def bloomPrefilter(
      fact: DataFrame, factKey: Column, dimKeys: DataFrame,
      bits: Int = 1 << 16, hashes: Int = 5): DataFrame = {
    require(bits > 64 && Integer.bitCount(bits) == 1,
      s"bloomPrefilter: bits must be a power of two > 64, got $bits")
    require(hashes > 0 && hashes.toLong * bits < Int.MaxValue,
      s"bloomPrefilter: hashes must be positive (and k*m < 2^31), got $hashes")
    require(dimKeys.columns.length == 1,
      s"bloomPrefilter: dimKeys must be a single key column, got ${dimKeys.columns.toSeq}")
    require(!fact.columns.exists(_.startsWith("graft_bloom")),
      "graft_bloom* columns are reserved by bloomPrefilter")
    val m = lit(bits.toLong)
    def positions(key: Column): Seq[Column] = {
      val h1 = pmod(xxhash64(key), m)
      val h2 = pmod(xxhash64(key, lit("graft_bloom_h2")), m)
      (0 until hashes).map(i => pmod(h1 + lit(i.toLong) * h2, m))
    }
    val dimKey = col(dimKeys.columns.head)
    val mask = dimKeys
      .select(explode(array(positions(dimKey): _*)).as("graft_bloom_pos"))
      .select(shiftright(col("graft_bloom_pos"), 6).as("graft_bloom_w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(graft_bloom_pos % 64 AS INT))")
          .as("graft_bloom_m"))
      .groupBy("graft_bloom_w")
      .agg(expr("bit_or(graft_bloom_m)").as("graft_bloom_bits"))
      .agg(map_from_arrays(collect_list(col("graft_bloom_w")),
        collect_list(col("graft_bloom_bits"))).as("graft_bloom"))
    val probed = positions(factKey).zipWithIndex.foldLeft(
      fact.crossJoin(broadcast(mask))) { case (df, (p, i)) =>
      df.withColumn(s"graft_bloom_p$i", p)
    }
    val pass = (0 until hashes)
      .map(i => expr(
        s"(shiftright(coalesce(try_element_at(graft_bloom, shiftright(graft_bloom_p$i, 6)), " +
          s"CAST(0 AS BIGINT)), CAST(graft_bloom_p$i % 64 AS INT)) & 1) = 1"))
      .reduce(_ && _)
    probed.filter(pass)
      .drop("graft_bloom")
      .drop((0 until hashes).map(i => s"graft_bloom_p$i"): _*)
  }
}
