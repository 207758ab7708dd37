package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the shingle document-frequency cap (NearDup.MaxShingleDf)
  * bounds candidate volume under a hot-shingle corpus — the skew guard
  * for natural-language data where boilerplate phrases would otherwise
  * turn the inverted-index equi-join into the n² cross join.
  *
  * Corpus: 200 docs, ALL sharing a 5-word boilerplate prefix (its
  * trigrams have df = 100% ≫ the 10% cap) and each pair (2j, 2j+1)
  * sharing a unique 5-word body (df = 1%). Uncapped, every doc pair
  * shares a shingle → 19,900 candidates; capped, only the 100 true
  * near-dup pairs survive — and that capped universe is exactly what the
  * DuckDB oracle computes too, so this is the verified semantics. */
class ShingleCapSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs: Seq[(Long, String)] = (0 until 200).map { i =>
    val j = i / 2
    (i.toLong, s"hot boiler plate common prefix p$j q$j r$j s$j t$j")
  }

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shingle_sf").toFile
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  test("uncapped candidate space on this corpus is the n² blow-up") {
    def tris(s: String): Set[String] =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (_, t) => tris(t) }
    var shared = 0
    for (a <- sets.indices; b <- (a + 1) until sets.size)
      if ((sets(a) & sets(b)).nonEmpty) shared += 1
    assert(shared == 19900) // C(200,2): every pair shares the boilerplate
  }

  test("q61 with the df cap returns only the 100 true near-dup pairs") {
    val rows = SparkEntry.queries("q61_dedup_ngram_jaccard")(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 100).map(j => (2L * j, 2L * j + 1)).toSet
    assert(got == expected, s"got ${got.size} pairs; diff=${(got -- expected).take(5)}")
    // kept shingle universe per doc: 2 prefix-boundary + 3 body trigrams
    rows.foreach { r =>
      assert(r.getAs[Long]("inter") == 5L)
      assert(r.getAs[Double]("jaccard") == 1.0)
    }
  }

  test("q50 minhash with the df cap recovers the true pairs, bounded") {
    val got = SparkEntry.queries("q50_dedup_minhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (0 until 100).map(j => (2L * j, 2L * j + 1)).toSet
    // capped signatures come from the pair-unique shingles → every true
    // pair has identical signatures and must band-match...
    assert(expected.subsetOf(got.toSet), s"missing: ${(expected -- got.toSet).take(5)}")
    // ...and the candidate volume stays near the true-pair count instead
    // of the boilerplate-driven 19,900
    assert(got.length < 500, s"candidate volume not bounded: ${got.length}")
  }
}
