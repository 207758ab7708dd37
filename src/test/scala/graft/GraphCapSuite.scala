package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves q170's part-degree cap (GraphOps.MaxPartDegree) bounds the
  * wedge-join pair space under a hot-part graph — the co-occurrence
  * analogue of the shingle df cap (ShingleCapSuite): one commodity part
  * supplied by everyone would otherwise make supplier-pair generation
  * quadratic in the supplier count.
  *
  * Graph: 100 suppliers ALL supply hot part 0 (degree 100 ≫ the 50 cap);
  * each pair (2j, 2j+1) additionally shares a unique cold part j+1
  * (degree 2). Uncapped, every supplier pair co-occurs → C(100,2) = 4950
  * candidates; capped, exactly the 50 true pairs survive — and the
  * DuckDB oracle computes the same capped universe, so this is the
  * verified semantics, not a divergence. Degrees still count ALL parts
  * (hot included), so the Jaccard denominator stays honest. */
class GraphCapSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val edges: Seq[(Long, Long)] =
    (0 until 100).map(s => (s.toLong, 0L)) ++
      (0 until 50).flatMap(j => Seq((2L * j, j + 1L), (2L * j + 1, j + 1L)))

  private lazy val sfDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_graphcap_sf").toFile
    edges.toDF("l_suppkey", "l_partkey").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/lineitem.parquet")
    dir.getAbsolutePath
  }

  test("uncapped co-occurrence space on this graph is the n² blow-up") {
    val parts = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    var shared = 0
    for (a <- 0 until 100; b <- (a + 1) until 100)
      if ((parts(a.toLong) & parts(b.toLong)).nonEmpty) shared += 1
    assert(shared == 4950) // C(100,2): every pair shares the hot part
  }

  test("q170 with the degree cap returns only true cold-part pairs; degrees stay global") {
    val rows = SparkEntry.queries("q170_graph_jaccard")(spark, sfDir).collect()
    assert(rows.length == 20) // top-20 of the 50 surviving pairs
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[Long]("sa"), r.getAs[Long]("sb"))
      assert(sb == sa + 1 && sa % 2 == 0, s"unexpected pair ($sa,$sb)")
      assert(r.getAs[Long]("shared") == 1L)  // the cold part only
      assert(r.getAs[Long]("da") == 2L && r.getAs[Long]("db") == 2L) // hot part still counted
      assert(r.getAs[Double]("jaccard") == 0.333333) // r6(1/3)
    }
    // deterministic tie-break: the 20 smallest sa among equal-jaccard pairs
    assert(rows.map(_.getAs[Long]("sa")).sorted.toSeq == (0L until 40L by 2))
  }
}
