package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.pipeline.{Multimodal, PageRank}
import graft.search.Snippets

/** Multimodal plumbing, snippets, PageRank — auxiliary operator suite. */
class AuxOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("multimodal: binary payload features, frame sampling, resize") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abc")).toDF("id", "text")
    val media = Multimodal.attach(docs, "id", "text")
    assert(media.schema("media").dataType.typeName == "binary")

    val feats = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getInt(3))).toMap
    val md5hello = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(feats(1L) == ((11L, md5hello, 'h'.toInt)))
    assert(feats(2L)._1 == 0L && feats(2L)._3 == -1)

    val frames = Multimodal.frameSample(media, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2))).toMap
    assert(frames(1L)._1 == 3L) // bytes 0,4,8 of "hello world"
    assert(frames(1L)._2 == Seq('h'.toInt, 'o'.toInt, 'r'.toInt))
    assert(frames(2L)._1 == 0L)

    val resized = Multimodal.resize(media, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(resized.values.forall(_.length == 4))
    assert(new String(resized(3L).filter(_ != 0), "UTF-8").nonEmpty)
  }

  test("WAV decode: RIFF/PCM-16 round-trip, features, malformed payloads observable") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, 7)
    val bytes = Multimodal.synthWavBytes(samples, 44100)
    val parsed = Multimodal.parseWav(bytes)
    assert(parsed.contains((44100, 1, samples)) ||
      parsed.exists { case (r, c, s) => r == 44100 && c == 1 && s.sameElements(samples) })

    val media = Seq(
      (1L, bytes),
      (2L, "not a wav".getBytes("UTF-8")),
      (3L, Multimodal.synthWavBytes(Array[Short](), 8000))
    ).toDF("id", "media")
    val feats = Multimodal.decodeWav(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    val meanAbs = samples.map(s => math.abs(s.toLong)).sum / samples.length.toDouble
    assert(feats(1L) == ((44100, 1, samples.length.toLong,
      BigDecimal(meanAbs).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 32768L)))
    assert(feats(2L) == ((-1, -1, 0L, 0.0, 0L))) // undecodable row kept, flagged
    assert(feats(3L) == ((8000, 1, 0L, 0.0, 0L)))
  }

  test("BMP decode: 24bpp round-trip incl. row padding + bottom-up order; malformed observable") {
    // 3×2, w=3 ⇒ 9 row bytes padded to 12 — exercises the pad path;
    // distinct per-pixel channels pin BGR order and bottom-up rows
    val px = Array(0x010203, 0x405060, 0xFF0080, 0x112233, 0x99AABB, 0x000000)
    val bytes = Multimodal.synthBmpBytes(3, 2, px)
    val parsed = Multimodal.parseBmp(bytes)
    assert(parsed.exists { case (w, h, p) => w == 3 && h == 2 && p.sameElements(px) })

    val media = Seq(
      (1L, bytes),
      (2L, "not a bmp".getBytes("UTF-8"))
    ).toDF("id", "media")
    val feats = Multimodal.decodeBmp(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    def mean(f: Int => Int): Double =
      BigDecimal(px.map(f).sum / px.length.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(feats(1L) == ((3, 2, 6L,
      mean(p => (p >> 16) & 0xff), mean(p => (p >> 8) & 0xff), mean(p => p & 0xff))))
    assert(feats(2L) == ((-1, -1, 0L, 0.0, 0.0, 0.0)))
  }

  test("PNG decode: zlib inflate + every scanline filter type round-trips; malformed observable") {
    val px = Array(0x010203, 0x405060, 0xFF0080, 0x112233, 0x99AABB, 0x000000,
      0xDEADBE, 0xC0FFEE, 0x123456)
    // each filter type produces DIFFERENT bytes on disk; the decoder
    // must invert all five against the unfiltered neighbor rows
    (0 to 4).foreach { ft =>
      val bytes = Multimodal.synthPngBytes(3, 3, px, filterType = ft)
      val parsed = Multimodal.parsePng(bytes)
      assert(parsed.exists { case (w, h, p) => w == 3 && h == 3 && p.sameElements(px) },
        s"filter type $ft failed to round-trip")
    }
    val media = Seq(
      (1L, Multimodal.synthPngBytes(3, 3, px, filterType = 4)),
      (2L, "not a png".getBytes("UTF-8"))
    ).toDF("id", "media")
    val feats = Multimodal.decodePng(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    def mean(f: Int => Int): Double =
      BigDecimal(px.map(f).sum / px.length.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(feats(1L) == ((3, 3, 9L,
      mean(p => (p >> 16) & 0xff), mean(p => (p >> 8) & 0xff), mean(p => p & 0xff))))
    assert(feats(2L) == ((-1, -1, 0L, 0.0, 0.0, 0.0)))
  }

  test("adversarial payloads: overflowing chunk/dimension fields parse to None, never hang or crash") {
    // WAV chunk length le32 = -8 advances the walk by 0 bytes (infinite
    // loop before the guard); a huge positive length wrapped `off`
    // negative (StringIndexOutOfBounds); both must yield the sentinel
    def wavWithChunkLen(len: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(len)
      bb.array()
    }
    assert(Multimodal.parseWav(wavWithChunkLen(-8)).isEmpty)
    assert(Multimodal.parseWav(wavWithChunkLen(-10)).isEmpty)
    assert(Multimodal.parseWav(wavWithChunkLen(0x7FFFFFF0)).isEmpty)

    // BMP claiming w = 715827883: w*3 wraps negative, the old int bound
    // check passed, and the pixel allocation attempted ~2.8 GB
    val bmp = Multimodal.synthBmpBytes(1, 1, Array(0x112233))
    val bb = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 715827883)
    assert(Multimodal.parseBmp(bmp).isEmpty)

    // PNG IDAT length near 2^31: the int bound check wrapped negative and
    // the chunk copy threw; huge claimed dimensions must also fail (a
    // few-KB payload may not claim a multi-GB decode)
    val png = Multimodal.synthPngBytes(3, 3, Array.fill(9)(0x010203), filterType = 0)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = png.clone(); f(c); c
    }
    val idatOff = (0 until png.length - 4)
      .find(o => new String(png, o, 4, "US-ASCII") == "IDAT").get - 4
    assert(Multimodal.parsePng(patched { c =>
      java.nio.ByteBuffer.wrap(c).putInt(idatOff, 0x7FFFFF00)
    }).isEmpty)
    assert(Multimodal.parsePng(patched { c =>
      val b2 = java.nio.ByteBuffer.wrap(c)
      b2.putInt(16, 50000); b2.putInt(20, 50000) // IHDR w,h (big-endian)
    }).isEmpty)

    // frameSample stride must fail fast at the driver, not per-row
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(Seq((1L, Array[Byte](1, 2))).toDF("id", "media"), 0)
    }
  }

  test("hand-rolled BMP/PNG parsers match the JDK ImageIO reference decoder") {
    val px = Array(0x010203, 0x405060, 0xFF0080, 0x112233, 0x99AABB, 0x000000)
    def viaImageIO(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val w = img.getWidth; val h = img.getHeight
      (w, h, Array.tabulate(w * h)(i => img.getRGB(i % w, i / w) & 0xffffff))
    }
    val bmp = Multimodal.synthBmpBytes(3, 2, px)
    val (bw, bh, bp) = viaImageIO(bmp)
    assert(Multimodal.parseBmp(bmp).exists { case (w, h, p) =>
      w == bw && h == bh && p.sameElements(bp) })
    (0 to 4).foreach { ft =>
      val png = Multimodal.synthPngBytes(3, 2, px, filterType = ft)
      val (pw, ph, pp) = viaImageIO(png)
      assert(Multimodal.parsePng(png).exists { case (w, h, p) =>
        w == pw && h == ph && p.sameElements(pp) }, s"PNG filter $ft vs ImageIO")
    }
  }

  test("JPEG decode via ImageIO: real lossy decode, solid color within tolerance") {
    val bytes = Multimodal.synthJpegBytes(8, 6, 0x8040C0)
    val media = Seq((1L, bytes), (2L, "not a jpeg".getBytes("UTF-8"))).toDF("id", "media")
    val feats = Multimodal.decodeImageIO(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val (w, h, n, mr, mg, mb) = feats(1L)
    assert(w == 8 && h == 6 && n == 48L)
    assert(math.abs(mr - 0x80) <= 4 && math.abs(mg - 0x40) <= 4 && math.abs(mb - 0xC0) <= 4,
      s"solid-color JPEG decoded means drifted: $mr $mg $mb")
    assert(feats(2L) == ((-1, -1, 0L, 0.0, 0.0, 0.0)))
  }

  test("snippets merge match regions and highlight terms") {
    val az = Analyzer(mode = "simple")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
           "lambda mu alpha nu"),
      (2L, "nothing matches here")
    ).toDF("docId", "content")
    val out = Snippets.build(docs, "#combine(alpha)", az, windowWidth = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // two alpha matches farther apart than windowWidth → two regions
    assert(out(1L) ==
      "<b>alpha</b> beta gamma ... lambda mu <b>alpha</b> nu")
    assert(!out.contains(2L))
    // close matches merge into one region
    val one = Snippets.build(
      Seq((3L, "x alpha y alpha z")).toDF("docId", "content"),
      "alpha", az, windowWidth = 5).collect()
    assert(one.head.getString(1) == "x <b>alpha</b> y <b>alpha</b> z")
  }

  test("document metadata verbs: documents / documentMetadata / documentIDsFromMetadata") {
    import graft.index.{IndexBuilder, IndexConfig}
    import graft.search.{Engine, ScoringRule}
    val corpus = Seq(
      (1L, "alpha beta", "en", "srcA"),
      (2L, "beta gamma", "de", "srcB"),
      (3L, "gamma alpha", "en", "srcA"),
      (4L, "delta", "fr", "srcC")
    ).toDF("docId", "content", "lang", "source")
    val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
    val idx = IndexBuilder.build(corpus.select("docId", "content"), cfg)
    val eng = new Engine(spark, idx, cfg.analyzer, ScoringRule(method = "okapi"))
    eng.setMetadata(corpus)

    val ids = eng.documentIDsFromMetadata("source", Seq("srcA"))
    assert(ids.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val meta = eng.documentMetadata(ids, Seq("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(meta == Map(1L -> "en", 3L -> "en"))
    val full = eng.documents(Seq(2L).toDF("docId")).collect()
    assert(full.length == 1 && full.head.getAs[String]("content") == "beta gamma")
    assert(eng.documentsFromMetadata("lang", Seq("en")).count() == 2)

    // deletion is honored by the retrieval verbs too
    eng.deleteDocuments(Seq(3L).toDF("docId"))
    assert(eng.documentIDsFromMetadata("source", Seq("srcA"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("runAnnotatedQuery: per-node extents for result docs match evaluateRaw") {
    import graft.index.{IndexBuilder, IndexConfig}
    import graft.search.{Engine, QueryParser, ScoringRule}
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta gamma beta"),
      (3L, "gamma alpha"),
      (4L, "delta")
    ).toDF("docId", "content")
    val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
    val idx = IndexBuilder.build(docs, cfg)
    val eng = new Engine(spark, idx, cfg.analyzer, ScoringRule(method = "okapi"))
    val qa = eng.runAnnotatedQuery("#combine(alpha #od1(beta gamma))", 10)
    val resultDocs = qa.results.collect().map(_.getLong(0)).toSet
    val ann = qa.annotations.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getInt(3))).toSet
    // annotations cover only result docs
    assert(ann.forall { case (_, d, _, _) => resultDocs.contains(d) })
    // alpha: doc1 @0,3; doc3 @1
    assert(ann.filter(_._1 == "0:combine/0:term(alpha)") ==
      Set(("0:combine/0:term(alpha)", 1L, 0, 1), ("0:combine/0:term(alpha)", 1L, 3, 4),
          ("0:combine/0:term(alpha)", 3L, 1, 2)))
    // od1(beta gamma): doc1 @[1,3); doc2 @[0,2)
    assert(ann.filter(_._1 == "0:combine/1:od1") ==
      Set(("0:combine/1:od1", 1L, 1, 3), ("0:combine/1:od1", 2L, 0, 2)))
    // nested term leaves annotated too
    assert(ann.exists(_._1 == "0:combine/1:od1/0:term(beta)"))
    assert(ann.exists(_._1 == "0:combine/1:od1/1:term(gamma)"))
    // results equal plain runQuery
    val plain = eng.runQuery("#combine(alpha #od1(beta gamma))", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(qa.results.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == plain)
  }

  test("PageRank matches scalar power iteration (c=0.7, 10 iters)") {
    val nodes = (0L to 4L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val got = PageRank.compute(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // scalar oracle (reference: src/PageRank.cpp:103-117)
    val n = 5.0; val c = 0.7; val base = (1 - c) / n
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L), 2L -> Seq(0L), 3L -> Seq(2L))
    var pr = Map(0L -> base, 1L -> base, 2L -> base, 3L -> base, 4L -> base)
    for (_ <- 1 to 10) {
      val acc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      out.foreach { case (s, ds) => ds.foreach { d => acc(d) += pr(s) / ds.size } }
      pr = pr.keys.map(k => k -> (c * acc(k) + base)).toMap
    }
    pr.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"node $k") }
    // node 4 is isolated: stays at the base score
    assert(math.abs(got(4L) - base) < 1e-15)
  }

  test("PageRank: a source outside the node universe contributes the initial (1-c)/N") {
    // reference _readPageRankFromFile returns (1-c)/colLen for a doc
    // absent from the pr file (PageRank.cpp:76-83) — its out-links carry
    // base/outdeg every iteration; an inner join dropped them entirely
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((3L, 1L), (3L, 2L)).toDF("src", "dst") // src 3 ∉ nodes
    val got = PageRank.compute(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = (1.0 - 0.7) / 2.0
    val want = 0.7 * (base / 2.0) + base // src 3 stays at base forever
    assert(math.abs(got(1L) - want) < 1e-15, s"got ${got(1L)}, want $want")
    assert(math.abs(got(2L) - want) < 1e-15)
  }
}
