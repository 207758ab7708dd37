package graft

import graft.functions.EntropyLog2
import graft.streaming.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit + property tests for the custom aggregator, multimodal plumbing,
  * and the anonymization invariants (SURVEY.md §5.3). Property loops use
  * a fixed-seed Random (the scalatest/scalacheck bridge artifact is not
  * on the offline classpath). */
class FunctionsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("EntropyLog2.finish matches -Σ p·log2 p (DuckDB entropy parity case)") {
    // {1,1,2,3}: p = (2/4, 1/4, 1/4) → H = 1.5 (verified = DuckDB entropy())
    val buf = scala.collection.mutable.HashMap("1" -> 2L, "2" -> 1L, "3" -> 1L)
    assert(math.abs(EntropyLog2.finish(buf) - 1.5) < 1e-12)
    assert(EntropyLog2.finish(scala.collection.mutable.HashMap.empty) == 0.0)
    assert(EntropyLog2.finish(scala.collection.mutable.HashMap("x" -> 5L)) == 0.0)
  }

  test("EntropyLog2 merge order does not change the result") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val values = List.fill(30)(rnd.nextInt(5) + 1).map(_.toString)
      val whole = values.foldLeft(EntropyLog2.zero)(EntropyLog2.reduce)
      val (l, r) = values.splitAt(values.length / 2)
      val merged = EntropyLog2.merge(
        l.foldLeft(EntropyLog2.zero)(EntropyLog2.reduce),
        r.foldLeft(EntropyLog2.zero)(EntropyLog2.reduce))
      assert(EntropyLog2.finish(whole) == EntropyLog2.finish(merged))
    }
  }

  test("registered entropy udaf equals direct computation on a DataFrame") {
    import spark.implicits._
    spark.udf.register("entropy_log2_t", udaf(EntropyLog2))
    val df = Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"), ("h", "z"))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(expr("entropy_log2_t(v)").as("h"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("g") - 1.5) < 1e-12)
    assert(got("h") == 0.0)
  }

  test("generalization (q38 binning) is idempotent and order-preserving") {
    val rnd = new Random(7)
    for (_ <- 1 to 50) {
      val xs = List.fill(50)(rnd.nextDouble() * 19999.98 - 9999.99)
      val bins = xs.map(x => math.floor(x / 1000).toLong * 1000)
      // idempotent: binning a bin is the bin
      assert(bins.map(b => math.floor(b / 1000.0).toLong * 1000) == bins)
      // order-preserving
      val sorted = xs.sorted.map(x => math.floor(x / 1000).toLong * 1000)
      assert(sorted == sorted.sorted)
    }
  }

  test("multimodal decodeFeatures: schema, byte stats, fake dims in range") {
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(docs))
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val len = r.getAs[Long]("byte_len")
      assert(len > 0)
      assert((1 to 64).contains(r.getAs[Int]("width")))
      assert((1 to 64).contains(r.getAs[Int]("height")))
      val mean = r.getAs[Double]("byte_mean")
      assert(mean > 0 && mean < 256)
    }
  }

  test("multimodal: null payload survives the decode path") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]], Some("image/png")))
      .toDF("media_id", "payload", "mime")
    val rows = Multimodal.decodeFeatures(df).collect()
    assert(rows.length == 1 && rows(0).isNullAt(3))
  }

  // minimal valid-header payloads, crafted byte by byte
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val be = (v: Int) => Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be(13) ++ "IHDR".getBytes("US-ASCII") ++ be(w) ++ be(h) ++
      Array[Byte](8, 6, 0, 0, 0)
  }

  private def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val le4 = (v: Int) => Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val le2 = (v: Int) => Array(v.toByte, (v >> 8).toByte)
    "RIFF".getBytes("US-ASCII") ++ le4(36) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le4(16) ++ le2(1) ++ le2(channels) ++
      le4(sampleRate) ++ le4(sampleRate * channels * 2) ++ le2(channels * 2) ++ le2(16)
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val le4 = (v: Int) => Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    "BM".getBytes("US-ASCII") ++ le4(54) ++ le4(0) ++ le4(54) ++
      le4(40) ++ le4(w) ++ le4(h)
  }

  test("decodeReal parses PNG IHDR, BMP header, WAV fmt from raw bytes") {
    assert(Multimodal.decodeReal(pngBytes(640, 480), "image/png") == ((640, 480)))
    assert(Multimodal.decodeReal(bmpBytes(33, 77), "image/bmp") == ((33, 77)))
    assert(Multimodal.decodeReal(wavBytes(44100, 2), "audio/wav") == ((44100, 2)))
    intercept[IllegalArgumentException] {
      Multimodal.decodeReal("not media".getBytes("US-ASCII"), "text/plain")
    }
    // truncated PNG (signature only, no IHDR) must not mis-parse
    intercept[IllegalArgumentException] {
      Multimodal.decodeReal(pngBytes(1, 1).take(10), "image/png")
    }
  }

  test("resizeFeatures: aspect-preserving fit, no upscale, thumb tracks area") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(pngBytes(640, 480)), Some("image/png")),
      (2L, Some(pngBytes(32, 16)), Some("image/png")))
      .toDF("media_id", "payload", "mime")
    val feats = Multimodal.decodeFeatures(df, useRealDecoder = true)
    val out = Multimodal.resizeFeatures(feats, 100, 100).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("out_width") == 100 && out(0).getAs[Int]("out_height") == 75)
    // small image is NOT upscaled
    assert(out(1).getAs[Int]("out_width") == 32 && out(1).getAs[Int]("out_height") == 16)
    assert(out(0).getAs[Array[Byte]]("thumb").nonEmpty)
  }

  test("sampleFrames: every-nth chunk with stable indices; null payload drops") {
    import spark.implicits._
    val payload = Array.tabulate(1000)(_.toByte)
    val df = Seq((7L, Some(payload), Some("video/raw")),
      (8L, Option.empty[Array[Byte]], Some("video/raw")))
      .toDF("media_id", "payload", "mime")
    val rows = Multimodal.sampleFrames(df, frameCount = 10, every = 3)
      .orderBy("media_id", "frame_idx").collect()
    assert(rows.map(_.getLong(0)).forall(_ == 7L))
    assert(rows.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    // chunks are the right slices: frame 3 starts at byte 300
    assert(rows(1).getAs[Array[Byte]]("frame")(0) == 300.toByte)
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length == 100))
  }

  test("decodeFeatures with the real decoder extracts true dimensions") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(pngBytes(640, 480)), Some("image/png")),
      (2L, Some(wavBytes(16000, 1)), Some("audio/wav")))
      .toDF("media_id", "payload", "mime")
    val rows = Multimodal.decodeFeatures(df, useRealDecoder = true)
      .orderBy("media_id").collect()
    assert(rows(0).getAs[Int]("width") == 640 && rows(0).getAs[Int]("height") == 480)
    assert(rows(1).getAs[Int]("width") == 16000 && rows(1).getAs[Int]("height") == 1)
  }

  test("FloatDot: codegen and interpreted paths agree, nulls propagate") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val df = Seq(
      (1L, Some(Array(1.5f, 2.0f, -3.25f)), Some(Array(2.0f, 0.5f, 4.0f))),
      (2L, None, Some(Array(1.0f, 1.0f, 1.0f))),
      (3L, Some(Array(1.0f)), Some(Array(2.0f, 9.0f)))) // length mismatch → min length
      .toDF("id", "a", "b")
    val rows = df.selectExpr("id", "graft_dot(a, b) AS d").orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.5 * 2.0 + 2.0 * 0.5 + -3.25 * 4.0)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getDouble(1) == 2.0)
    // interpreted eval (no codegen) must agree with the codegen'd result
    val e = graft.functions.FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.5f, 2.0f, -3.25f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 0.5f, 4.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == rows(0).getDouble(1))
  }

  test("JaroWinkler: textbook values, empty/null contract, codegen==interpreted") {
    import spark.implicits._
    graft.functions.JaroWinkler.register(spark)
    // textbook cases, each pre-verified against DuckDB's
    // jaro_winkler_similarity this round (the q235 oracle function)
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    // boost threshold: jaro 0.6 with a 4-char common prefix stays 0.6
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // DuckDB's empty contract: any empty side → 0, including both
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("a", "b") == 0.0)
    // DataFrame path (codegen) agrees with the direct kernel + nulls propagate
    val rows = Seq((1L, Some("martha"), Some("marhta")), (2L, None, Some("x")))
      .toDF("id", "a", "b")
      .selectExpr("id", "graft_jaro_winkler(a, b) AS s").orderBy("id").collect()
    assert(rows(0).getDouble(1) == jw("martha", "marhta"))
    assert(rows(1).isNullAt(1))
    // interpreted eval path agrees too
    val e = graft.functions.JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal("martha"),
      org.apache.spark.sql.catalyst.expressions.Literal("marhta"))
    assert(e.eval(null) == rows(0).getDouble(1))
  }

  test("TopKByScore: equals sort-take on random data under any merge split") {
    val agg = new graft.functions.TopKByScore(5)
    val rnd = new Random(7)
    for (_ <- 1 to 50) {
      // duplicate scores on purpose — the id tiebreak must resolve them
      val xs = List.fill(40)((rnd.nextInt(8).toDouble, rnd.nextLong().abs))
        .distinctBy(_._2)
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(5)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      assert(whole == expect)
      // random 3-way split, merged in a random order
      val shuffled = rnd.shuffle(xs)
      val parts = shuffled.grouped(math.max(shuffled.length / 3, 1)).toList
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(parts).reduce(agg.merge)
      assert(merged == expect, "merge tree changed the kept set")
    }
    assert(agg.reduce(agg.zero, (1.0, 9L)) == List((1.0, 9L)))
    intercept[IllegalArgumentException] { new graft.functions.TopKByScore(0) }
  }

  test("determinism double-run: representative queries byte-identical") {
    for (name <- Seq("q05_join_shuffle", "q12_agg_hash", "q44_anon_entropy_ldiv",
        "q50_dedup_minhash", "q60_dedup_simhash", "q63_ann_ivf",
        "q76_dedup_components", "q80_anon_tcloseness",
        "q83_dedup_simhash_pairs", "q85_sample_stratified", "q87_gapfill")) {
      val a = SparkEntry.queries(name)(spark, TestSpark.sfDir).collect().toSeq
      val b = SparkEntry.queries(name)(spark, TestSpark.sfDir).collect().toSeq
      assert(a == b, s"$name differs between runs")
    }
  }
}
