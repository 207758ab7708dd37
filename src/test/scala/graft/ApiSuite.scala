package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public Graft facade working on ARBITRARY frames — none of these
  * inputs come from the test tables, proving the primitives are generic
  * library surface, not query-suite internals. (Each primitive's exact
  * semantics are separately oracle-verified through the query that
  * delegates to it.) */
class ApiSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column primitives: pseudonym, masking, generalization") {
    import spark.implicits._
    val df = Seq((1L, "Alice Z9", 1234.56), (2L, "Bob Q31", -87.0))
      .toDF("id", "name", "bal")
      .select(col("id"),
        Graft.pseudonym(col("name"), "s3cr3t").as("p"),
        Graft.maskKeepPrefix(col("name"), 3).as("m"),
        Graft.maskDigits(col("name")).as("d"),
        Graft.generalizeNumeric(col("bal"), 100).as("bin"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{64}")))
    assert(rows(0).getString(2) == "Ali***" && rows(1).getString(2) == "Bob***")
    assert(rows(0).getString(3) == "Alice Z#" && rows(1).getString(3) == "Bob Q##")
    assert(rows(0).getLong(4) == 1200L && rows(1).getLong(4) == -100L)
  }

  test("kAnonymityAudit + suppressBelowK on a synthetic QI frame") {
    import spark.implicits._
    // group (a,x): 3 members (k=3 ok); (b,y): 1 member (violates)
    val df = Seq(("a", "x", 1), ("a", "x", 2), ("a", "x", 3), ("b", "y", 4))
      .toDF("qi1", "qi2", "v")
    val audit = Graft.kAnonymityAudit(df, Seq("qi1", "qi2"), 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(audit == Set(("a", 3L, false), ("b", 1L, true)))
    val sup = Graft.suppressBelowK(df, Seq("qi1", "qi2"), 3)
    val byV = sup.collect().map(r => r.getAs[Int]("v") ->
      (r.getAs[String]("qi1_k"), r.getAs[String]("qi2_k"))).toMap
    assert(byV(1) == (("a", "x")) && byV(4) == ((null, null)))
  }

  test("exactDedup and minhashPairs on a synthetic corpus") {
    import spark.implicits._
    val docs = Seq(
      (10L, "one two three four five six"),
      (11L, "one two three four five six"), // exact dup of 10
      (12L, "totally different words here now then")).toDF("doc_id", "text")
    val dedup = Graft.exactDedup(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dedup == Map(10L -> 2L, 12L -> 1L))
    val pairs = Graft.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)))
    // simhash: identical docs → identical fingerprints
    val sh = Graft.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(10L) == sh(11L) && sh(10L) != sh(12L))
  }

  test("chunkDocuments with non-default geometry tiles and rebuilds") {
    import spark.implicits._
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = Graft.chunkDocuments(docs, chunkTokens = 10, stride = 5)
      .collect().sortBy(_.getLong(1))
    // starts at 0,5,10,15,20 → 5 chunks; last has 3 tokens
    assert(chunks.length == 5)
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq == Seq(10L, 10L, 10L, 8L, 3L))
    val rebuilt = (chunks.init.map(_.getAs[String]("chunk_text").split(" ").take(5).mkString(" ")) :+
      chunks.last.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuilt == text)
  }

  test("denseTokens and saltedJoin delegate to the verified plans") {
    import spark.implicits._
    val tokens = Graft.denseTokens(Seq("m", "a", "z", "a").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tokens == Map("a" -> 1L, "m" -> 2L, "z" -> 3L))
    val left = Seq((1L, "p"), (1L, "q"), (2L, "r")).toDF("k", "v")
    val right = Seq((1L, "dim1"), (2L, "dim2")).toDF("rk", "name")
    val got = Graft.saltedJoin(left, right, col("k"), col("rk"), 4)
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "p", "dim1"), (1L, "q", "dim1"), (2L, "r", "dim2")))
  }

  test("decontaminate, packSequences, rebalanceClasses on synthetic corpora") {
    import spark.implicits._
    val train = Seq((1L, "a b c d e f"), (2L, "z y x w v u")).toDF("doc_id", "text")
    val heldOut = Seq((100L, "a b c d e x")).toDF("doc_id", "text")
    val d = Graft.decontaminate(train, heldOut).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(d == Map(1L -> true, 2L -> false))

    // 20 docs × 10 tokens into 25-token bins: bins overflow by < 1 doc,
    // so every bin holds ≤ 3 docs and bins are dense from 0 per bucket
    val docs = (1L to 20L).map(i => (i, (1 to 10).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Graft.packSequences(docs, packLen = 25, buckets = 2).collect()
    assert(packed.length == 20)
    val perBin = packed.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("bin")))
    assert(perBin.values.forall(_.length <= 3))
    perBin.keys.groupBy(_._1).foreach { case (_, bins) =>
      val bs = bins.map(_._2).toSeq.sorted
      assert(bs == (0L until bs.length).toSeq, s"bins not dense: $bs")
    }

    val classes = (1 to 30).map(i => (i.toLong, if (i <= 20) "big" else "small"))
      .toDF("id", "cls")
    val kept = Graft.rebalanceClasses(classes, "cls", "id")
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 10L) // smallest class: thresh 10000 keeps all
    assert(kept.getOrElse("big", 0L) < 20L) // downsampled toward 10
  }

  test("kmeans separates an obviously two-cluster embedding set") {
    import spark.implicits._
    // seeds 0 and 1 land one in each blob, so Lloyd's converges at once
    val blobA = Seq(0L, 2L, 4L, 6L).map(i => (i, Array(10f, 0f, 0f, i * 0.01f)))
    val blobB = Seq(1L, 3L, 5L, 7L).map(i => (i, Array(0f, 10f, 0f, i * 0.01f)))
    val emb = (blobA ++ blobB).toDF("vec_id", "embedding")
    val got = Graft.kmeans(emb, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == 8)
    assert(Seq(0L, 2L, 4L, 6L).map(got).distinct.length == 1)
    assert(Seq(1L, 3L, 5L, 7L).map(got).distinct.length == 1)
    assert(got(0L) != got(1L))

    // regression: ANY id domain works — seeding is "k lowest ids", not
    // filter(id < k), which returned an empty frame for offset ids
    val offset = (blobA ++ blobB).map { case (i, v) => (i + 1000L, v) }
      .toDF("vec_id", "embedding")
    val got2 = Graft.kmeans(offset, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2.size == 8, s"offset-id kmeans returned ${got2.size} rows")
    assert(got2(1000L) != got2(1001L))
  }

  test("trailingRangeJoin, slidingDistinct, zValue on synthetic series") {
    import spark.implicits._
    val probes = Seq((1L, 1000L)).toDF("p_id", "p_ts")
    val points = Seq(950L, 1000L, 900L, 1001L).toDF("c_ts")
    val joined = Graft.trailingRangeJoin(probes, points, windowUs = 100L)
      .collect().map(_.getAs[Long]("c_ts")).toSet
    assert(joined == Set(950L, 1000L)) // (900, 1000]: 900 excluded, 1001 out

    val activity = Seq(("a", 0L), ("b", 1L)).toDF("key", "bkt")
    val sliding = Graft.slidingDistinct(activity, windowBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sliding == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))

    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L)).toDF("x", "y")
      .select(Graft.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(1L, 2L, 15L))
  }

  test("pageRank on a symmetric 2-cycle converges to the uniform fixed point") {
    import spark.implicits._
    // A⇄B with equal weights: uniform (0.5, 0.5) is the exact fixed
    // point at ANY damping, and it is reached in one iteration — so 3
    // iterations must return exactly 0.5/0.5 (r6-rounded)
    val edges = Seq((1L, 2L, 10L), (2L, 1L, 10L)).toDF("src", "dst", "w")
    val ranks = Graft.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
    assert(ranks == Map(1L -> 0.5, 2L -> 0.5), ranks.toString)
    // a pure sink (dangling) keeps only teleport + inflow; source loses rank
    val chain = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val cr = Graft.pageRank(chain).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
    assert(cr(2L) > cr(1L), s"sink must out-rank its source: $cr")
  }

  test("heavyHitters summary honors MG bounds on a known stream") {
    import spark.implicits._
    // 60×"a", 30×"b", 10 singletons; k=4 ⇒ error ≤ n/(k+1)=20 per partition set
    val words = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      (1 to 10).map(i => s"w$i")).toDF("w")
    val m = words.coalesce(1) // single partition: exact bound n/(k+1)
      .agg(Graft.heavyHitters(k = 4)(col("w")).as("s"))
      .select(explode(col("s"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet.contains("a") && m.keySet.contains("b"))
    assert(m("a") <= 60L && m("a") >= 60L - 20L)
    assert(m("b") <= 30L && m("b") >= 30L - 20L)
    assert(m.size <= 4)
  }

  test("triangleCounts on known graphs: K4 and a triangle-free path") {
    import spark.implicits._
    // K4 fed as a noisy DIRECTED multigraph (both directions) — the
    // primitive must canonicalize; every node sits in C(3,2)=3 triangles
    val k4 = (for (a <- 0 to 3; b <- 0 to 3 if a != b) yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val got = Graft.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graft.triangleCounts(path).collect().isEmpty)
  }

  test("locfBackfill and lastTouchAttribution on a synthetic event log") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1L, "obs", 5.0), (1L, 20L, 2L, "gap", 0.0), (1L, 30L, 3L, "obs", 7.0),
      (1L, 40L, 4L, "gap", 0.0), (2L, 10L, 5L, "gap", 0.0))
      .toDF("k", "t", "id", "kind", "v")
    val filled = Graft.locfBackfill(df, col("k"), col("t"), col("id"),
      when(col("kind") === "obs", col("v")), "v")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("v_filled"))).toMap
    assert(filled(1L).contains(5.0) && filled(3L).contains(7.0))
    assert(filled(2L).contains(5.0) && filled(4L).contains(7.0)) // gaps carry forward
    assert(filled(5L).isEmpty) // other key, no prior observation

    val ev = Seq(
      (1L, 10L, 1L, "touch"), (1L, 18L, 2L, "conv"), // gap 8 ≤ 10 → attributed
      (1L, 40L, 3L, "conv"),                         // gap 30 > 10 → organic
      (2L, 5L, 4L, "conv"))                          // no touch at all
      .toDF("k", "t", "id", "kind")
    val att = Graft.lastTouchAttribution(ev, col("k"), col("t"), col("id"),
      col("kind") === "touch", col("kind") === "conv", lookback = 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[Any]("attributed_id")), Option(r.getAs[Any]("gap"))))).toMap
    assert(att(2L) == ((Some(1L), Some(8L))))
    assert(att(3L) == ((None, None)) && att(4L) == ((None, None)))
    assert(!att.contains(1L)) // touches are dropped from the output
  }

  test("stratifiedKFold balances every stratum exactly") {
    import spark.implicits._
    // strata of size 7 and 3: folds must split 3/2/2 and 1/1/1
    val df = ((1 to 7).map(i => ("s1", i.toLong)) ++
      (8 to 10).map(i => ("s2", i.toLong))).toDF("grp", "id")
    val folded = Graft.stratifiedKFold(df, "grp", col("id"), 3).collect()
    assert(folded.length == 10)
    val sizes = folded.groupBy(r => (r.getString(0), r.getAs[Long]("fold")))
      .view.mapValues(_.length)
    val s1 = (0L until 3L).map(f => sizes.getOrElse(("s1", f), 0))
    assert(s1.sorted == Seq(2, 2, 3) && s1.sum == 7)
    assert((0L until 3L).forall(f => sizes.getOrElse(("s2", f), 0) == 1))
  }

  test("transitionSupport counts distinct keys per transition") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "b"), (3L, 2L, "a")).toDF("k", "t", "s")
    val got = Graft.transitionSupport(df, col("k"), col("t"), col("t"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("n_occ")))).toMap
    assert(got(("a", "b")) == ((2L, 3L))) // keys 1 (twice) and 2
    assert(got(("b", "a")) == ((2L, 2L))) // keys 1 and 3
  }

  test("cusumChangepoint finds the injected level shift") {
    import spark.implicits._
    // flat at 10 for t=1..5, then flat at 20 for t=6..10: |cusum| peaks at t=5
    val df = (1 to 10).map(t => ("k", t.toLong, if (t <= 5) 10.0 else 20.0))
      .toDF("k", "t", "v")
    val row = Graft.cusumChangepoint(df, col("k"), col("t"), col("v")).head()
    assert(row.getAs[Long]("change_point") == 5L)
    assert(row.getAs[Long]("n_points") == 10L)
    assert(row.getAs[Double]("cusum") == -25.0) // 5·10 − 5·15
    assert(row.getString(4) == "down")
  }

  test("cohensKappa matches the hand-computed 2-class case") {
    import spark.implicits._
    // 2×2 confusion: tp=4, fn=1, fp=1, tn=4 → po=0.8, pe=0.5, κ=0.6
    val df = (Seq.fill(4)(("y", "y")) ++ Seq(("y", "n")) ++
      Seq(("n", "y")) ++ Seq.fill(4)(("n", "n"))).toDF("truth", "pred")
    val row = Graft.cohensKappa(df, col("truth"), col("pred")).head()
    assert(row.getAs[Long]("n") == 10L)
    assert(row.getAs[Double]("po") == 0.8)
    assert(row.getAs[Double]("pe") == 0.5)
    assert(row.getAs[Double]("kappa") == 0.6)
  }

  test("iqrOutliers flags exactly the planted extremes") {
    import spark.implicits._
    // group g: 1..9 (q1=3, q3=7, fences [-3, 13]) plus outliers -50 and 50
    val df = (((1 to 9).map(_.toDouble) ++ Seq(-50.0, 50.0)).map(("g", _)))
      .toDF("grp", "v")
    val row = Graft.iqrOutliers(df, "grp", col("v")).head()
    assert(row.getAs[Long]("n") == 11L)
    assert(row.getAs[Double]("iqr") == row.getAs[Double]("q3") - row.getAs[Double]("q1"))
    assert(row.getAs[Long]("n_outliers") == 2L)
  }

  test("bipartiteJaccard ranks full-overlap pairs first under the cap") {
    import spark.implicits._
    // a/b share both parts (J=1); c shares one with a (J=1/3); hot part
    // 99 touches everyone but exceeds maxDegree=3 → generates no pairs
    val edges = Seq(
      ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L), ("c", 1L), ("c", 3L),
      ("d", 99L), ("e", 99L), ("a", 99L), ("b", 99L)).toDF("s", "p")
    val rows = Graft.bipartiteJaccard(edges, "s", "p", maxDegree = 3, topK = 10)
      .collect()
    val got = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("jaccard")).toMap
    assert(!got.keySet.exists { case (x, y) => x == "d" || y == "d" }) // hot-only node
    assert(rows.head.getString(0) == "a" && rows.head.getString(1) == "b")
    // a/b: degrees 3 (hot part counted), shared capped = 2 → J = 2/(3+3−2)
    assert(got(("a", "b")) == 0.5)
    // a/c: degrees 3 and 2, shared capped = 1 → J = 1/(3+2−1)
    assert(got(("a", "c")) == 0.25)
  }

  test("mixtureWeights: sqrt scaling compresses a 4:1 imbalance to 2:1") {
    import spark.implicits._
    val df = (Seq.fill(16)("big") ++ Seq.fill(4)("small")).toDF("src")
    val rows = Graft.mixtureWeights(df, "src").collect()
      .map(r => r.getString(0) -> r).toMap
    // √16 : √4 = 2 : 1 → weights 2/3 and 1/3 (raw shares were 0.8 / 0.2)
    assert(math.abs(rows("big").getAs[Double]("weight") - 2.0 / 3) < 1e-6)
    assert(math.abs(rows("small").getAs[Double]("weight") - 1.0 / 3) < 1e-6)
    assert(rows("big").getAs[Double]("sample_rate") < 1.0)   // downsample head
    assert(rows("small").getAs[Double]("sample_rate") > 1.0) // upsample tail
  }

  test("vocabCoverage is monotone and hits 1.0 once k spans the vocabulary") {
    import spark.implicits._
    val docs = Seq("a a a a b b c", "a b b d").toDF("text")
    val rows = Graft.vocabCoverage(docs, Seq(1L, 2L, 4L)).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("coverage")).toMap
    assert(rows(1L) == math.floor(5.0 / 11 * 1e6 + 0.5) / 1e6) // 'a' ×5 of 11
    assert(rows(1L) < rows(2L) && rows(2L) < rows(4L))
    assert(rows(4L) == 1.0) // 4 types total
  }

  test("vocabCoverage rejects degenerate probe lists at the facade (ADVICE r9)") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text")
    // empty ks used to surface as an opaque UnsupportedOperationException
    // from ks.max; k > Int.MaxValue silently truncated the head LIMIT
    intercept[IllegalArgumentException](Graft.vocabCoverage(docs, Seq.empty))
    intercept[IllegalArgumentException](Graft.vocabCoverage(docs, Seq(0L)))
    intercept[IllegalArgumentException](Graft.vocabCoverage(docs, Seq(-3L)))
    intercept[IllegalArgumentException](
      Graft.vocabCoverage(docs, Seq(5L, Int.MaxValue.toLong + 1L)))
    // the boundary itself is legal
    assert(Graft.vocabCoverage(docs, Seq(Int.MaxValue.toLong)).columns.nonEmpty)
  }

  test("ingestDedup flags exact and near dups against the index only") {
    import spark.implicits._
    val index = Seq(
      (1L, "one two three four five six seven"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "one two three four five six seven"),   // exact dup of 1
      (11L, "unrelated completely different words entirely")).toDF("doc_id", "text")
    val got = Graft.ingestDedup(batch, index).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got(10L)._1, "exact dup not flagged")
    assert(got(10L)._2, "identical text must also be a near dup (Hamming 0)")
    assert(!got(10L)._3 && got(11L)._3)
    assert(!got(11L)._1)
  }

  test("splitLeakage reports the planted 5-gram leak and nothing else") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six", "train"),
      (2L, "one two three four five leaked", "test"), // shares a 5-gram w/ 1
      (3L, "alpha beta gamma delta epsilon zeta", "test"),
      (4L, "red green blue cyan magenta yellow", "val")).toDF("doc_id", "text", "sp")
    val rows = Graft.splitLeakage(docs, "sp", "train").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("test").getAs[Long]("n_docs") == 2L)
    assert(rows("test").getAs[Long]("n_leaky") == 1L)   // doc 2 only
    assert(rows("val").getAs[Long]("n_leaky") == 0L)
    assert(rows("val").getAs[Double]("leak_rate") == 0.0)
  }

  test("containmentPairs flags the quoted sub-document both ways") {
    import spark.implicits._
    // doc 2 (3 trigrams) is a prefix quote of doc 1 (6 trigrams):
    // inter = 3 → cont_a = 0.5, cont_b = 1.0; doc 3 shares nothing
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5"),
      (3L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val rows = Graft.containmentPairs(docs, tau = 0.5).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Long]("inter") == 3L)
    assert(r.getAs[Double]("cont_a") == 0.5 && r.getAs[Double]("cont_b") == 1.0)
  }

  test("autocorrelation of an alternating series: negative lag-1, positive lag-2") {
    import spark.implicits._
    // 10,20 alternating over 8 buckets: dev = ±5, sxx = 200,
    // s1 = 7·(−25) = −175, s2 = 6·25 = 150, s3 = 5·(−25) = −125
    val df = (1 to 8).map(t => ("k", t.toLong, if (t % 2 == 0) 20.0 else 10.0))
      .toDF("k", "t", "v")
    val got = Graft.autocorrelation(df, col("k"), col("t"), col("v"), maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Double]("acf")))).toMap
    assert(got(1L) == ((8L, -0.875)))
    assert(got(2L) == ((8L, 0.75)))
    assert(got(3L) == ((8L, -0.625)))
  }

  test("kHopReach counts exact frontier sizes per hop") {
    import spark.implicits._
    // s0—{c1,c2}, s1—{c2,c3}, s2—{c3}: from s0, h1 = {c1,c2},
    // h2 = {s1} (shared c2), h3-new = {c3} (via s1, c2 already in h1)
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L))
      .toDF("c", "s")
    val seeds = Seq(10L).toDF("seed")
    val r = Graft.kHopReach(edges, seeds).head()
    assert(r.getAs[Long]("n_cust_h1") == 2L)
    assert(r.getAs[Long]("n_supp_h2") == 1L)
    assert(r.getAs[Long]("n_cust_h3_new") == 1L)
  }

  test("kmAnonymityAudit flags itemsets below k") {
    import spark.implicits._
    // items: a→{u1,u2,u3}, b→{u1,u2}, pair a|b→{u1,u2}; k=3
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "a"))
      .toDF("u", "i")
    val got = Graft.kmAnonymityAudit(df, col("u"), col("i"), k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("m"), r.getAs[Long]("support"), r.getAs[Boolean]("risky")))).toMap
    assert(got("a") == ((1L, 3L, false)))
    assert(got("b") == ((1L, 2L, true)))
    assert(got("a|b") == ((2L, 2L, true)))
  }

  test("kaplanMeier risk table: censoring held at risk, NULL after S hits 0") {
    import spark.implicits._
    // t=1: 2 events + 1 censored of 4 at risk → ln S = ln(2/4);
    // t=2: the last subject converts (d = n) → S = 0 → ln_surv NULL
    val df = Seq((1L, 1L), (1L, 1L), (0L, 1L), (1L, 2L)).toDF("ev", "t")
    val rows = Graft.kaplanMeier(df, col("ev"), col("t")).collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_risk") == 4L && r1.getAs[Long]("d_events") == 2L &&
      r1.getAs[Long]("c_censored") == 1L)
    assert(math.abs(r1.getAs[Double]("ln_surv") - math.log(0.5)) < 1e-5)
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_risk") == 1L && r2.getAs[Long]("d_events") == 1L)
    assert(r2.isNullAt(r2.fieldIndex("ln_surv")), "ln_surv must be NULL once S = 0")
  }

  test("shortestPaths relaxes the diamond and leaves unreachable nodes NULL") {
    import spark.implicits._
    // 0→1 (1), 0→2 (5), 1→2 (1), 2→3 (1): d = [0, 1, 2, 3];
    // node 4 only has an OUT-edge → unreachable from 0 → NULL
    val edges = Seq((0L, 1L, 1.0), (0L, 2L, 5.0), (1L, 2L, 1.0),
      (2L, 3L, 1.0), (4L, 0L, 1.0)).toDF("src", "dst", "cost")
    val got = Graft.shortestPaths(edges, Seq(0L).toDF("node"), rounds = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(0L -> Some(0.0), 1L -> Some(1.0), 2L -> Some(2.0),
      3L -> Some(3.0), 4L -> None))
  }

  test("dpMedian selects near the true median bin and reports the utility gap") {
    import spark.implicits._
    // values 0..9, binWidth 2 → bins 0..4 of 2 each; cum = 2,4,6,8,10 →
    // util = −3,−1,−1,−3,−5; true argmax (tie → lowest bin) = bin 1
    val df = (0 until 10).map(_.toDouble).toDF("v")
    val r = Graft.dpMedian(df, col("v"), binWidth = 2.0).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("true_bin") == 1L)
    assert(r.getAs[Long]("selected_bin") >= 0L && r.getAs[Long]("selected_bin") <= 4L)
    assert(r.getAs[Double]("utility_gap") >= 0.0)
  }

  test("pointInTimeJoin honors the TTL: stale versions leave a coverage gap") {
    import spark.implicits._
    // key k: version A at t=0, B at t=10. Facts at t=5 (→A), t=12 (→B),
    // t=25 (B is 15 units old > ttl=10 → NULL), and a same-t fact at
    // t=10 (version sorts first → B applies).
    val versions = Seq(("k", 0L, 100L, "A"), ("k", 10L, 101L, "B"))
      .toDF("key", "t", "version_id", "v")
    val facts = Seq(("k", 5L, 1L), ("k", 10L, 2L), ("k", 12L, 3L), ("k", 25L, 4L))
      .toDF("key", "t", "fact_id")
    val got = Graft.pointInTimeJoin(facts, versions, ttl = 10L)
      .collect().map(r => r.getAs[Long]("fact_id") ->
        (if (r.isNullAt(3)) None else Some(r.getString(3)))).toMap
    assert(got == Map(1L -> Some("A"), 2L -> Some("B"), 3L -> Some("B"), 4L -> None))
  }

  test("clusteringCoef: triangle nodes score 1, pendant NULL, junction 1/3") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant edge 3-4: nodes 1,2 have cc 1;
    // node 3 (deg 3, 1 triangle of 3 possible) → 1/3; node 4 (deg 1) → NULL
    val edges = Seq((1, 2), (2, 3), (3, 1), (3, 4)).toDF("src", "dst")
    val got = Graft.clusteringCoef(edges).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"),
        if (r.isNullAt(3)) None else Some(r.getAs[Double]("cc")))).toMap
    assert(got(1) == ((2L, 1L, Some(1.0))))
    assert(got(2) == ((2L, 1L, Some(1.0))))
    assert(got(3)._1 == 3L && got(3)._2 == 1L)
    assert(math.abs(got(3)._3.get - 1.0 / 3.0) < 2e-6)
    assert(got(4) == ((1L, 0L, None)))
  }

  test("hits: star authority concentrates on the centre, hubs on the spokes") {
    import spark.implicits._
    // 1,2,3 all point at 4; 4 points nowhere
    val edges = Seq((1, 4), (2, 4), (3, 4)).toDF("src", "dst")
    val got = Graft.hits(edges).collect()
      .map(r => r.getInt(0) -> (r.getAs[Double]("hub"), r.getAs[Double]("auth"))).toMap
    assert(got(4)._2 > 0.999, s"centre authority ${got(4)._2}")
    assert(got(4)._1 == 0.0, "centre has no out-edges, hub must be 0")
    Seq(1, 2, 3).foreach { n =>
      assert(got(n)._2 == 0.0, s"spoke $n has no in-edges")
      assert(math.abs(got(n)._1 - 1.0 / 3.0) < 2e-6)
    }
  }

  test("intervalUnion merges overlaps and keeps gaps apart") {
    import spark.implicits._
    // [0,10] ∪ [5,20] merge (covered 20); [30,35] separate (covered 5)
    val iv = Seq(("k", 0L, 10L, 1L), ("k", 5L, 20L, 2L), ("k", 30L, 35L, 3L))
      .toDF("key", "s", "e", "tie")
    val r = Graft.intervalUnion(iv).head()
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("covered") == 25L)
  }

  test("nearestMatch picks the nearer side, earlier on ties, NULL out of tolerance") {
    import spark.implicits._
    val probes = Seq(("k", 10L, 1L), ("k", 50L, 2L), ("k", 100L, 3L))
      .toDF("key", "t", "id")
    val cands = Seq(("k", 7L, 90L), ("k", 12L, 91L), ("k", 45L, 92L), ("k", 55L, 93L))
      .toDF("key", "t", "id")
    val got = Graft.nearestMatch(probes, cands, tolerance = 5L)
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(3)) None else Some(r.getAs[Long]("match_id")))).toMap
    // probe 1 at t=10: cands at 7 (gap 3) and 12 (gap 2) → 91
    // probe 2 at t=50: gaps 5 both sides → tie → earlier (92)
    // probe 3 at t=100: nothing within 5 → NULL
    assert(got == Map(1L -> Some(91L), 2L -> Some(92L), 3L -> None))
  }

  test("weightedMedian lands where cumulative weight crosses half") {
    import spark.implicits._
    // weights: v=1 w=1, v=2 w=1, v=3 w=10 → total 12, half at v=3
    val df = Seq(("k", 1.0, 1L, 1L), ("k", 2.0, 1L, 2L), ("k", 3.0, 10L, 3L))
      .toDF("key", "v", "w", "tie")
    val r = Graft.weightedMedian(df).head()
    assert(r.getAs[Long]("w_total") == 12L && r.getAs[Double]("median_v") == 3.0)
  }

  test("cdcCompact: last op wins, deletes drop the key") {
    import spark.implicits._
    val chg = Seq(
      ("a", 1L, "I", 10.0), ("a", 2L, "U", 11.0),
      ("b", 1L, "I", 20.0), ("b", 2L, "D", 0.0),
      ("c", 1L, "I", 30.0)).toDF("key", "seq", "op", "v")
    val got = Graft.cdcCompact(chg).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_ops"),
        r.getAs[Long]("last_seq"), r.getAs[Double]("v"))).toMap
    assert(got == Map("a" -> ((2L, 2L, 11.0)), "c" -> ((1L, 1L, 30.0))))
  }

  test("rocCurve: perfect separation gives AUC 1, reversal gives 0") {
    import spark.implicits._
    val perfect = Seq((9L, 1L), (9L, 1L), (1L, 0L), (1L, 0L)).toDF("bin", "pos")
    assert(Graft.rocCurve(perfect).head().getAs[Double]("auc") == 1.0)
    val reversed = Seq((1L, 1L), (9L, 0L)).toDF("bin", "pos")
    assert(Graft.rocCurve(reversed).head().getAs[Double]("auc") == 0.0)
    // all-ties → 0.5 exactly (the tie correction)
    val ties = Seq((5L, 1L), (5L, 0L)).toDF("bin", "pos")
    assert(Graft.rocCurve(ties).head().getAs[Double]("auc") == 0.5)
  }

  test("noveltyScores: dup doc scores 0, half-recombined doc scores 0.5") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),  // grams abcde, bcdef — both first here
      (2L, "a b c d e f"),  // exact dup → 0 novel
      (3L, "a b c d e x")). // abcde seen, bcdex new → 0.5
      toDF("doc_id", "text")
    val got = Graft.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("novelty")).toMap
    assert(got(1L) == 1.0 && got(2L) == 0.0 && got(3L) == 0.5)
  }

  test("expectations: NULL predicate counts as violation, one pass, guards") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "c"), (4L, null))
      .toDF("id", "tag")
    val got = Graft.expectations(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "id_positive" -> (col("id") > 0), // NULL id → NULL predicate → violation
      "tag_domain" -> col("tag").isin("a", "b", "c")))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got("id_not_null") == ((1L, false)))
    assert(got("id_positive") == ((1L, false)), "NULL comparison must count as violation")
    assert(got("tag_domain") == ((1L, false)), "NULL tag fails isin (3VL)")
    intercept[IllegalArgumentException] { Graft.expectations(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Graft.expectations(df, Seq("x" -> lit(true), "x" -> lit(false)))
    }
  }

  test("profile: null accounting, uniqueness, numeric norms; HLL path runs") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "x", 2.5), (2L, "x", null), (null, "y", 7.0), (4L, null, 2.5))
      .toDF("id", "tag", "v")
    val got = Graft.profile(df, approxDistinct = false).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("id").getLong(1) == 4 && got("id").getLong(2) == 1) // n_rows, n_nulls
    assert(got("id").getLong(3) == 3 && got("id").getBoolean(4)) // distinct, unique
    assert(got("tag").getLong(3) == 2 && !got("tag").getBoolean(4))
    assert(got("v").getDouble(5) == 2.5 && got("v").getDouble(6) == 7.0)
    assert(got("tag").isNullAt(5) && got("tag").isNullAt(6)) // strings: no min/max
    // the scale path must produce the same shape (values approximate)
    val hll = Graft.profile(df).collect()
    assert(hll.length == 3 && hll.forall(_.getLong(1) == 4))
  }

  test("topKPerGroup: k best per group, score ties resolved by id") {
    import spark.implicits._
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 9.0, 4L),
      ("b", 1.0, 5L)).toDF("g", "s", "i")
    val got = Graft.topKPerGroup(df, Seq("g"), col("s"), col("i"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", 1L, 4L, 9.0), ("a", 2L, 1L, 5.0), // tie 5.0: id 1 beats id 2
      ("b", 1L, 5L, 1.0))) // short group: fewer than k rows kept
    intercept[IllegalArgumentException] {
      Graft.topKPerGroup(df, Seq.empty, col("s"), col("i"), 2)
    }
  }

  test("bloomPrefilter keeps every match, rejects reserved columns") {
    import spark.implicits._
    val fact = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val dim = Seq(3L, 500L, 999L, 12345L).toDF("dk") // 12345 matches nothing
    val kept = Graft.bloomPrefilter(fact, col("k"), dim).collect()
    val keptKeys = kept.map(_.getLong(0)).toSet
    assert(Set(3L, 500L, 999L).subsetOf(keptKeys), "bloom dropped a true match")
    assert(kept.length < 1000, "bloom pruned nothing")
    assert(kept.forall(_.schema.fieldNames.sameElements(Array("k", "v"))),
      "helper columns must not leak into the output")
    intercept[IllegalArgumentException] {
      Graft.bloomPrefilter(fact.withColumn("graft_bloom_p0", lit(1)), col("k"), dim)
    }
    intercept[IllegalArgumentException] {
      Graft.bloomPrefilter(fact, col("k"), dim, bits = 1000) // not a power of two
    }
  }

  test("conversionPairs: strict-before band, per-user; guards bad window") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "click", 100L), (2L, 1L, "purchase", 150L), // in band
      (3L, 1L, "click", 150L), // simultaneous with purchase → strict < drops
      (4L, 2L, "click", 100L), (5L, 2L, "purchase", 300L), // outside 100-µs band
      (6L, 3L, "purchase", 50L)) // organic: no click at all
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val got = Graft.conversionPairs(ev, 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 2L, 50L)), got.mkString(", "))
    intercept[IllegalArgumentException] { Graft.conversionPairs(ev, 0L) }
  }

  test("temporalSplit: embargo band excluded from train AND test; audit proves gap") {
    import spark.implicits._
    val df = Seq("2020-01-01", "2020-05-15", "2020-05-25", "2020-06-01", "2020-07-04")
      .toDF("d").select(to_date(col("d")).as("d"))
    val got = Graft.temporalSplit(df, col("d"), "2020-06-01", embargoDays = 30)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDate(2).toString, r.getDate(3).toString))).toMap
    // embargo band = [2020-05-02, 2020-06-01): both May rows land in it
    assert(got("train") == ((1L, "2020-01-01", "2020-01-01")))
    assert(got("embargo") == ((2L, "2020-05-15", "2020-05-25")))
    assert(got("test") == ((2L, "2020-06-01", "2020-07-04")))
    // the audit itself proves the purge: train max + embargo < test min
    assert(java.time.LocalDate.parse(got("train")._2.toString).plusDays(30)
      .isBefore(java.time.LocalDate.parse("2020-06-02")))
    intercept[IllegalArgumentException] {
      Graft.temporalSplit(df, col("d"), "2020-06-01", embargoDays = -1)
    }
  }

  test("diversitySample: one min-id representative per cell; guards granularity") {
    import spark.implicits._
    val df = Seq(
      (10L, Array(0.10f, 0.10f)), // cell (0,0) at g=8: floor(0.8)=0
      (7L, Array(0.05f, 0.12f)), // same cell, smaller id → representative
      (20L, Array(-0.30f, 0.10f)), // cell (-3, 0)
      (30L, Array(0.30f, -0.20f))) // cell (2, -2)
      .toDF("vec_id", "embedding")
    val got = Graft.diversitySample(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got((0L, 0L)) == ((7L, 2L)), "min vec_id must represent the cell")
    assert(got((-3L, 0L)) == ((20L, 1L)) && got((2L, -2L)) == ((30L, 1L)))
    intercept[IllegalArgumentException] { Graft.diversitySample(df, granularity = 0) }
  }

  test("randomizedResponse: p=1 is exact; estimates always sum back to N") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("k", "v")
    // p = 100%: nobody lies, estimator collapses to the observed counts
    val exact = Graft.randomizedResponse(df, col("k"), col("v"), Seq("a", "b"), 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(exact.toSeq == Seq(("a", 66L, 66L, 66.0), ("b", 134L, 134L, 134.0)))
    // p = 50%: individual rows are noisy but Σ est = N algebraically
    val noisy = Graft.randomizedResponse(df, col("k"), col("v"), Seq("a", "b"), 50)
      .collect()
    assert(math.abs(noisy.map(_.getDouble(3)).sum - 200.0) < 1e-6,
      "debiased estimates must sum to the population")
    assert(noisy.map(_.getLong(1)).sum == 200L)
    intercept[IllegalArgumentException] {
      Graft.randomizedResponse(df, col("k"), col("v"), Seq("a", "b"), 0)
    }
    intercept[IllegalArgumentException] {
      Graft.randomizedResponse(df, col("k"), col("v"), Seq.empty, 75)
    }
    // a category with ZERO true holders must still appear (lies land on
    // it) — an inner join would drop it and break the Σ est = N identity
    val onlyA = (1L to 100L).map((_, "a")).toDF("k", "v")
    val rows = Graft.randomizedResponse(onlyA, col("k"), col("v"), Seq("a", "b"), 50)
      .collect()
    assert(rows.length == 2, "zero-holder category must not vanish")
    val b = rows.find(_.getString(0) == "b").get
    assert(b.getLong(1) == 0L && b.getLong(2) > 0L,
      "category b: n_true 0 but reported lies > 0")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 100.0) < 1e-5,
      "sum-to-N must survive the zero-holder case")
  }

  test("sentiment: hand-checked lexicon scores; overlapping lexica rejected") {
    import spark.implicits._
    val docs = Seq(
      ("en", "good good bad x"),   // (2-1)/4 = 0.25
      ("en", "bad bad x x"),       // (0-2)/4 = -0.5
      ("fr", "x x x x")).toDF("lang", "text") // 0
    val got = Graft.sentiment(docs, Seq("good"), Seq("bad")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("en") == ((2L, -0.125, 1L, 1L))) // mean of 0.25 and -0.5
    assert(got("fr") == ((1L, 0.0, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Graft.sentiment(docs, Seq("good", "x"), Seq("x"))
    }
    intercept[IllegalArgumentException] { Graft.sentiment(docs, Seq.empty, Seq("bad")) }
  }

  test("prCurve: hand-checked precision/recall sweep and average precision") {
    import spark.implicits._
    val scored = Seq((900L, 1L), (900L, 1L), (500L, 0L), (500L, 1L), (100L, 0L))
      .toDF("bin", "pos")
    val got = Graft.prCurve(scored).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(900L) == ((1.0, 0.666667, 0.916667)))
    assert(got(500L) == ((0.75, 1.0, 0.916667)))
    assert(got(100L) == ((0.6, 1.0, 0.916667)))
  }

  test("ksTest: hand-checked ECDF gaps; row 1 is the KS statistic") {
    import spark.implicits._
    // sample1 = {1,2}, sample2 = {2,3,4}: gaps .5, 2/3, 1/3, 0 → D at v=2
    val df = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, false), (4.0, false))
      .toDF("v", "g")
    val rows = Graft.ksTest(df, col("v"), col("g"), topN = 2).collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(0) == 2.0 && rows(0).getDouble(7) == 0.666667)
    assert(rows(1).getDouble(0) == 1.0 && rows(1).getDouble(7) == 0.5)
    assert(rows(0).getLong(3) == 2L && rows(0).getLong(4) == 3L) // n totals
  }

  test("mannWhitney: hand-checked U, tie-corrected sigma, z") {
    import spark.implicits._
    // g1 = {1,3}, g2 = {2,4,5}: R1 = 1+3, U1 = 1, U2 = 5, mu = 3,
    // sigma = sqrt(2·3/12·(6−0)) = √3, z = −2/√3
    val df = Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false), (5.0, false))
      .toDF("v", "g")
    val r = Graft.mannWhitney(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 5.0)
    assert(r.getDouble(5) == 3.0 && r.getDouble(6) == 1.732051)
    assert(r.getDouble(7) == -1.154701)
  }

  test("cvmTest: hand-checked tie-weighted integral statistic") {
    import spark.implicits._
    // sample1 = {1}, sample2 = {2}: at v=1 gap 1 (w=1), at v=2 gap 0
    // → S = 1, T = (1·1/2²)·1 = 0.25
    val df = Seq((1.0, true), (2.0, false)).toDF("v", "g")
    val r = Graft.cvmTest(df, col("v"), col("g")).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.25)
    // identical samples → T = 0
    val same = Seq((1.0, true), (1.0, false), (2.0, true), (2.0, false))
      .toDF("v", "g")
    assert(Graft.cvmTest(same, col("v"), col("g")).collect().head.getDouble(2) == 0.0)
  }

  test("spearman: monotone -> 1, anti-monotone -> -1, ties rank-averaged") {
    import spark.implicits._
    val up = Seq((1L, 10L), (2L, 40L), (3L, 90L), (4L, 160L)).toDF("x", "y")
    assert(Graft.spearman(up, col("x"), col("y")).collect().head.getDouble(1) == 1.0)
    val down = Seq((1L, 160L), (2L, 90L), (3L, 40L), (4L, 10L)).toDF("x", "y")
    assert(Graft.spearman(down, col("x"), col("y")).collect().head.getDouble(1) == -1.0)
    // tied x AND tied y at the same rows: rank vectors identical → 1
    val tied = Seq((1L, 3L), (1L, 3L), (2L, 7L)).toDF("x", "y")
    val r = Graft.spearman(tied, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 3L && r.getDouble(1) == 1.0)
  }

  test("adTest: identical samples score exactly 0; disjoint {1},{2} scores exactly 1") {
    import spark.implicits._
    val same = Seq((1.0, true), (1.0, false), (2.0, true), (2.0, false),
      (3.0, true), (3.0, false)).toDF("v", "g")
    val r0 = Graft.adTest(same, col("v"), col("g")).collect().head
    assert(r0.getLong(0) == 3L && r0.getLong(1) == 3L)
    assert(r0.getDouble(2) == 0.0)
    // hand-derived: two singleton disjoint samples give A^2 = 1
    val disj = Seq((1.0, true), (2.0, false)).toDF("v", "g")
    assert(Graft.adTest(disj, col("v"), col("g")).collect().head.getDouble(2) == 1.0)
  }

  test("holtForecast: flat start, positive trend on an increasing series") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0))
      .toDF("key", "tt", "x")
    val rows = Graft.holtForecast(df, col("key"), col("tt"), col("x"))
      .orderBy("t").collect()
    val first = rows.head
    // one observation: S′ = S″ = v ⇒ level = v, trend = 0, forecast = v
    assert(first.getDouble(2) == 1.0 && first.getDouble(3) == 1.0 &&
      first.getDouble(4) == 1.0 && first.getDouble(6) == 0.0 &&
      first.getDouble(7) == 1.0)
    // strictly increasing series: positive trend, forecast above level
    rows.tail.foreach { r =>
      assert(r.getDouble(6) > 0.0, s"trend not positive: $r")
      assert(r.getDouble(7) > r.getDouble(5), s"forecast not above level: $r")
    }
  }

  test("theilSen: outlier-robust slope; exact two-point fit") {
    import spark.implicits._
    // key a: y = t on t=0..3 plus one wild outlier (4, 100). 10 pairwise
    // slopes = {1 ×6, 25, 33, 49, 97} → median 1.0; residuals under
    // slope 1 = {0,0,0,0,96} → intercept 0.0. OLS would report ≈ 20.
    // key b: two points (0,5),(2,9) → slope 2, intercept 5, 1 pair.
    val df = (Seq(("a", 0L, 0.0), ("a", 1L, 1.0), ("a", 2L, 2.0),
      ("a", 3L, 3.0), ("a", 4L, 100.0), ("b", 0L, 5.0), ("b", 2L, 9.0)))
      .toDF("key", "tt", "x")
    val got = Graft.theilSen(df, col("key"), col("tt"), col("x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") == ((5L, 10L, 1.0, 0.0)))
    assert(got("b") == ((2L, 1L, 2.0, 5.0)))
  }

  test("crossCorr: lag-1-shifted linear series scores r = 1 at lag 1") {
    import spark.implicits._
    // y_{t+1} = 2·x_t + 3 for t = 0..2; y_0 = 100 wrecks the lag-0 fit
    val df = Seq((0L, 1.0, 100.0), (1L, 2.0, 5.0), (2L, 3.0, 7.0),
      (3L, 4.0, 9.0)).toDF("tt", "xx", "yy")
    val got = Graft.crossCorr(df, col("tt"), col("xx"), col("yy"), maxLag = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, 1.0)))
    assert(got(0L)._1 == 4L && got(0L)._2 < 0.0) // y0=100 on the smallest x
    assert(got(2L)._1 == 2L && got(2L)._2 == 1.0) // 2 points: trivially exact
  }

  test("similarityJoin: exactly the brute-force pairs, boilerplate included") {
    import spark.implicits._
    // Every doc shares a boilerplate head (its shingles are corpus-hot —
    // the df-capped q61 path would DROP them from the universe; the exact
    // join must keep them in the denominator), plus a distinctive tail.
    // Docs 1/2/7 are near-duplicates of each other; the rest are not.
    val boiler = "all rights reserved contact us for terms of service"
    val texts = Seq(
      1L -> s"$boiler alpha beta gamma delta epsilon zeta eta theta",
      2L -> s"$boiler alpha beta gamma delta epsilon zeta eta iota",
      3L -> s"$boiler completely different words one two three four five",
      4L -> s"$boiler yet more unrelated content six seven eight nine",
      5L -> s"$boiler eleven twelve thirteen fourteen fifteen sixteen",
      6L -> s"$boiler seventeen eighteen nineteen twenty twentyone",
      7L -> s"$boiler alpha beta gamma delta epsilon zeta mu nu",
      8L -> "short doc", // < 3 tokens: no shingle set, absent by contract
      9L -> s"$boiler twentytwo twentythree twentyfour twentyfive")
    def grams(t: String): Set[String] = {
      val ts = t.split(" ")
      if (ts.length < 3) Set.empty[String]
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      ga = grams(ta); gb = grams(tb) if ga.nonEmpty && gb.nonEmpty
      inter = ga.intersect(gb).size
      j = r6(inter.toDouble / (ga.size + gb.size - inter)) if j >= 0.6
    } yield (ia, ib, inter.toLong, j)).toSet
    assert(expected.nonEmpty && expected.map(p => (p._1, p._2))
      .subsetOf(Set((1L, 2L), (1L, 7L), (2L, 7L))))
    val got = Graft.similarityJoin(texts.toDF("doc_id", "text"), tau = 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("spanAudit: hand-checked islands — overlap merge, adjacent merge, 0-rows kept") {
    import spark.implicits._
    // k=3, minDocs=2. Shared 3-grams: "a b c" (docs 1,2,5), "b c d"
    // (docs 1,2,5). Doc 1 marks {0,1} → one span of 4 tokens; doc 2
    // marks {2,3} → one span of 4; doc 5 = "a b c d a b c" marks
    // {0,1,4}, where 4 − 1 = 3 = k is the ADJACENT case → all merge to
    // one span covering the whole doc. Docs 3 (nothing shared) and 4
    // (< k tokens, no grams) must still emit 0-span rows.
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d q r",
      3L -> "p q r s t u",
      4L -> "m n",
      5L -> "a b c d a b c").toDF("doc_id", "text")
    val got = Graft.spanAudit(docs, k = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((8L, 1L, 4L, 0.5)))
    assert(got(2L) == ((8L, 1L, 4L, 0.5)))
    assert(got(3L) == ((6L, 0L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0L, 0.0)))
    assert(got(5L) == ((7L, 1L, 7L, 1.0)))
  }

  test("budgetSelect: prefix selection, tie-break, no backfill, 0-kept group") {
    import spark.implicits._
    // group g: order by (score DESC, doc_id) = b(30), c(20), d(5), a(10);
    // total 65, budgetDiv 2 → budget 32. cum: 30 ✓, 50 ✗, 55 ✗, 65 ✗ —
    // only b kept; d (5 tokens) would FIT but prefix selection must not
    // backfill past the first crossing. Group h: its single doc exceeds
    // its own budget → 0 kept.
    val scored = Seq(
      (1L, "g", 10L, 5L), (2L, "g", 30L, 9L), (3L, "g", 20L, 7L),
      (4L, "g", 5L, 7L), (5L, "h", 8L, 1L))
      .toDF("doc_id", "source", "tokens", "score")
    val got = Graft.budgetSelect(scored, group = "source", budgetDiv = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[Long]("budget"),
          r.getAs[Boolean]("kept")))).toMap
    assert(got(2L) == ((30L, 32L, true)))
    assert(got(3L) == ((50L, 32L, false)))
    assert(got(4L) == ((55L, 32L, false))) // tie with c broken by doc_id
    assert(got(1L) == ((65L, 32L, false)))
    assert(got(5L) == ((8L, 4L, false)))
  }

  test("spanCorrupt: target spans substituted into sentinels rebuild the original") {
    import spark.implicits._
    val texts = Seq(
      1L -> (1 to 80).map(i => s"w$i").mkString(" "), // long: masking certain
      2L -> "alpha",                                   // 1 token
      3L -> (1 to 40).map(i => s"v${i % 7}").mkString(" "))
    val rows = Graft.spanCorrupt(texts.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    var totalMasked = 0L
    for ((id, nTok, nMask, corrupted, target) <- rows) {
      val orig = texts.toMap.apply(id).split(" ").toSeq
      assert(nTok == orig.length)
      // parse target "<X> a b <X> c" into spans; substitute in order
      val spans = scala.collection.mutable.Queue(
        target.split("<X> ").toSeq.filter(_.nonEmpty).map(_.trim.split(" ").toSeq): _*)
      assert(nMask == spans.map(_.length).sum)
      val rebuilt = corrupted.split(" ").toSeq.filter(_.nonEmpty).flatMap {
        case "<X>" => spans.dequeue()
        case tok => Seq(tok)
      }
      assert(spans.isEmpty && rebuilt == orig, s"doc $id failed round-trip")
      totalMasked += nMask
    }
    assert(totalMasked > 0) // the corpus is long enough that masking fired
  }

  test("rankNormalize: per-group ranks and pct; ties broken by id") {
    import spark.implicits._
    // group a: v = 5, 5, 9 → ranks by (v, id): id1→1, id2→2, id3→3,
    // pct = k/4. group b: one row → rank 1, pct = 1/2.
    val df = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 9.0),
      (4L, "b", 7.0)).toDF("id", "g", "v")
    val got = Graft.rankNormalize(df).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rn"), r.getAs[Double]("pct")))).toMap
    assert(got(1L) == ((1L, 0.25)) && got(2L) == ((2L, 0.5)) &&
      got(3L) == ((3L, 0.75)) && got(4L) == ((1L, 0.5)))
  }

  test("targetEncode: LOO excludes the own row and m pulls toward the prior") {
    import spark.implicits._
    // cat x: y = 10, 20; cat z: y = 30. prior = 20. m = 2.
    // id1: (20−10+10... wait) enc = (Σx − y_i + m·prior)/(n−1+m):
    //   id1 → (30 − 10 + 40)/(2−1+2) = 60/3 = 20.0
    //   id2 → (30 − 20 + 40)/3 = 50/3 = 16.666667 (r6)
    //   id3 → (30 − 30 + 40)/(1−1+2) = 40/2 = 20.0 (pure prior — the
    //   singleton category contributes nothing of itself)
    val df = Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "z", 30.0))
      .toDF("id", "cat", "y")
    val got = Graft.targetEncode(df, m = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("enc")).toMap
    assert(got(1L) == 20.0)
    assert(got(2L) == 16.666667)
    assert(got(3L) == 20.0)
  }

  test("ndcg: hand-checked DCG/IDCG with label-agreement relevance") {
    import spark.implicits._
    // probe 1 (label A) retrieves 10(A), 11(B), 12(A); corpus has 3 A's
    // ⇒ n_rel = 2, DCG = 1 + 0 + 0.5, IDCG = 1 + ln2/ln3
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("id_a", "id_b", "rn")
    val labels = Seq((1L, "A"), (10L, "A"), (11L, "B"), (12L, "A"))
      .toDF("id", "label")
    val r = Graft.ndcg(ranked, labels).collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "A" && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.5 && r.getDouble(4) == 1.63093)
    assert(math.abs(r.getDouble(5) - 1.5 / 1.63093) < 2e-6)
  }

  test("textClassifier: separable vocabularies reach perfect training accuracy") {
    import spark.implicits._
    // two disjoint vocabularies → hashed features are linearly separable;
    // 3 GD steps must classify the training set perfectly
    val pos = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta alpha beta", "p"))
    val neg = (20 until 40).map(i => (i.toLong, "omega sigma tau rho omega sigma", "n"))
    val docs = (pos ++ neg).toDF("doc_id", "text", "cls")
    val out = Graft.textClassifier(docs, col("cls") === "p").collect()
    assert(out.length == 64)
    assert(out.head.getAs[Double]("train_acc") == 1.0)
    // weights move in opposite directions for the two vocabularies
    val w = out.map(r => r.getAs[Long]("bucket") -> r.getAs[Double]("weight")).toMap
    assert(w.values.exists(_ > 0) && w.values.exists(_ < 0))
  }

  test("learningCurve: separable data stays perfect at every fraction; n_train grows") {
    import spark.implicits._
    val pos = (0 until 30).map(i => (i.toLong, "alpha beta gamma delta", "p"))
    val neg = (30 until 60).map(i => (i.toLong, "omega sigma tau rho", "n"))
    val docs = (pos ++ neg).toDF("doc_id", "text", "cls")
    val rows = Graft.learningCurve(docs, col("cls") === "p", Seq(50, 100))
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 100L))
    assert(rows(0).getAs[Long]("n_train") < rows(1).getAs[Long]("n_train"))
    assert(rows(1).getAs[Long]("n_train") == 60L)
    // disjoint vocabularies are separable from any subset that has both classes
    assert(rows.forall(_.getAs[Double]("full_acc") == 1.0))
  }

  test("pcaTopComponent: loading concentrates on the dominant direction, unit norm") {
    import spark.implicits._
    // variance lives on dim 2 (values ±10); dims 1 and 3 are near-constant
    val emb = (0 until 16).map { i =>
      (i.toLong, Array(0.01f * (i % 2), if (i % 2 == 0) 10f else -10f, 0.5f))
    }.toDF("vec_id", "embedding")
    val r = Graft.pcaTopComponent(emb, dims = 3).collect().sortBy(_.getLong(0))
    val loads = r.map(_.getAs[Double]("loading"))
    assert(math.abs(loads(1)) > 0.99, s"dominant dim not found: ${loads.toSeq}")
    assert(math.abs(loads.map(x => x * x).sum - 1.0) < 1e-4, "loading not unit-norm")
    assert(r.head.getAs[Double]("eigenvalue") > 50.0) // var(±10) = 100, ‖u‖/n ≥ λ-ish
  }

  test("dpGaussianRelease: no true counts leave, CSPRNG noise calibrated to sigma, runs differ") {
    // the production contract q362's audit mode verifies the calibration
    // for (ADVICE r14): schema must NOT carry true_n or mode; noise must
    // be nondeterministic across runs; dispersion must match sigma.
    import spark.implicits._
    val df = spark.range(4000).select((col("id") % 200).as("g"))
    val rel = Graft.dpGaussianRelease(df.toDF(), Seq("g"), eps = 0.5, delta = 1e-6)
    assert(rel.columns.toSeq == Seq("g", "epsilon", "delta", "sigma", "noisy_n"),
      s"release schema leaks: ${rel.columns.toSeq}")
    val sigma = math.sqrt(2.0 * math.log(1.25e6)) / 0.5
    val r1 = rel.collect().map(r => r.getAs[Long]("g") -> r.getAs[Double]("noisy_n")).toMap
    assert(r1.size == 200 && r1.values.forall(v => !v.isNaN))
    // every cell's true count is 20: recover z = (noisy - 20) / sigma
    val zs = r1.values.map(v => (v - 20.0) / sigma).toSeq
    val mean = zs.sum / zs.size
    val sd = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / (zs.size - 1))
    assert(math.abs(mean) < 0.35, s"z mean off: $mean") // 5-sigma at n=200
    assert(sd > 0.7 && sd < 1.3, s"z dispersion off: $sd (audit-mode md5 bug would be deterministic)")
    assert(zs.distinct.size > 150, "noise draws collide — not a real RNG")
    // ONE release per frame: re-collecting the SAME frame must NOT
    // re-draw (materialized inside the facade) — a second action that
    // re-drew would let a consumer average releases and shrink the
    // effective noise by sqrt(k)
    val r1b = rel.collect().map(r => r.getAs[Long]("g") -> r.getAs[Double]("noisy_n")).toMap
    assert(r1 == r1b, "re-collecting one release re-drew the noise — double-draw leak")
    // a SECOND facade call is a second release with fresh noise
    val r2 = Graft.dpGaussianRelease(df.toDF(), Seq("g"), eps = 0.5, delta = 1e-6)
      .collect().map(r => r.getAs[Long]("g") -> r.getAs[Double]("noisy_n")).toMap
    assert(r1 != r2, "two releases produced identical noise — CSPRNG not engaged")
    // the classical calibration's theorem precondition is enforced
    intercept[IllegalArgumentException] {
      Graft.dpGaussianRelease(df.toDF(), Seq("g"), eps = 1.0, delta = 1e-6)
    }
  }

  test("pqTrain: >= 2 sweeps, monotone non-increasing global SSE, convergence stop, q340 cross-check") {
    // VERDICT r14 item 3: the Lloyd-to-convergence driver loop over
    // q340's per-sweep dataflow.
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val (cb, hist) = Graft.pqTrain(emb, maxSweeps = 25, tol = 1e-3)
    // ran at least 2 sweeps and STOPPED on tolerance, not the cap
    assert(hist.size >= 2, s"only ${hist.size} sweep(s)")
    assert(hist.size < 25, s"hit maxSweeps without converging: $hist")
    // Lloyd's guarantee: global SSE never increases sweep over sweep
    hist.zip(hist.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-6, s"SSE increased: $hist")
    }
    // and the loop did real work: the first step strictly improves
    assert(hist(1) < hist(0), s"no strict first-step decrease: $hist")
    // codebook stays complete: 8 subspaces x 16 codes, 8-dim centroids
    val rows = cb.collect()
    assert(rows.length == 128, s"codebook has ${rows.length} cells")
    assert(rows.forall(_.getAs[Seq[Double]]("cv").length == 8))
    // cross-operator identity: sweep-0 SSE == q340's global sse_before
    // (same seed codebook, same assignment, same r6->DECIMAL fold)
    val q340Before = SparkEntry.queries("q340_pq_lloyd_step")(spark, TestSpark.sfDir)
      .collect().map(_.getAs[Double]("sse_before")).sum
    assert(math.abs(hist.head - q340Before) < 1e-4,
      s"sweep-0 SSE ${hist.head} != q340 sse_before total $q340Before")
  }

  test("winnowingPairs: a doc and its copy share every fingerprint; unrelated pair absent") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val b = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"
    val docs = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val pairs = Graft.winnowingPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("containment")))
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L)
    assert(pairs.head._3 == 1.0) // identical docs: full containment
  }

  test("tokenizerFertility: multi-byte text shows bytes_per_char > 1") {
    import spark.implicits._
    val docs = Seq(("en", "hello world"), ("zh", "日本 語文"))
      .toDF("lang", "text")
    val m = Graft.tokenizerFertility(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("en").getAs[Double]("bytes_per_char") == 1.0)
    assert(m("zh").getAs[Double]("bytes_per_char") > 2.0) // CJK = 3 B/char
    assert(m("zh").getAs[Long]("ws_tokens") == 2L)
  }

  test("facade pins are bounded and Graft.release drops only graft-owned caches (ADVICE r16)") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    // a library consumer who never calls a host sweep must not accumulate
    // caches without bound: beyond the registry cap the OLDEST pin is
    // evicted (safe — pins keep lineage). Graft.release() is the
    // documented explicit path, and it must not touch the consumer's
    // OWN cached frames.
    plans.FrameMemo.clear(spark)
    plans.CorpusPin.releaseAll(spark)
    val userCached = Seq((1L, "mine")).toDF("u", "tag").cache()
    userCached.count()
    val frames = (0 until 40).map { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").transform(plans.CorpusPin.pin)
    }
    assert(frames.take(8).forall(_.storageLevel == StorageLevel.NONE),
      "pins beyond the cap must evict the oldest entries")
    assert(frames.drop(8).forall(_.storageLevel.useDisk),
      "the newest pins inside the cap must stay persisted")
    Graft.release(spark)
    assert(frames.forall(_.storageLevel == StorageLevel.NONE),
      "release() must drop every remaining graft pin")
    assert(userCached.storageLevel.useMemory,
      "release() must NOT unpersist consumer-owned caches")
    userCached.unpersist(blocking = true)
  }

  test("perplexitySweep: retention is monotone in the threshold and hits 100%") {
    import spark.implicits._
    // repetitive docs score low NLL, a unique-vocab doc scores high
    val docs = Seq(
      (1L, "en", "a b a b a b a b"), (2L, "en", "a b a b a b a b"),
      (3L, "en", "a b a b a b a b"), (4L, "en", "q r s t u v w x")
    ).toDF("doc_id", "lang", "text")
    val sw = Graft.perplexitySweep(docs, Seq(-0.5, 0.0, 2.0))
      .collect().sortBy(_.getAs[Double]("off_nats"))
    val rates = sw.map(_.getAs[Double]("keep_rate"))
    assert(rates.zip(rates.tail).forall { case (lo, hi) => lo <= hi },
      s"keep_rate not monotone: ${rates.toSeq}")
    assert(rates.last == 1.0, "widest threshold must keep everything")
    assert(rates.head < 1.0, "tightest threshold must drop the outlier doc")
  }
}
