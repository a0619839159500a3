package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefgh" * 16),            // 128 bytes
    (1L, "short"),                    // 5 bytes
    (2L, "x" * 64))                   // exactly one frame
    .toDF("doc_id", "text")

  test("media table has binary payload and typed metadata") {
    val m = Multimodal.mediaFromDocs(docs)
    val sch = m.schema
    assert(sch("payload").dataType == BinaryType)
    assert(sch("meta").dataType.isInstanceOf[StructType])
    val r = m.where(col("media_id") === 0).collect().head
    assert(r.getAs[Array[Byte]]("payload").length == 128)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes") == 128)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
  }

  test("decode stub computes deterministic byte features per partition") {
    val f = Multimodal.decodeStub(Multimodal.mediaFromDocs(docs))
      .select("media_id", "n_bytes", "byte_mean", "head_hex")
      .as[(Long, Int, Double, String)].collect().sortBy(_._1)
    assert(f(1)._2 == 5)
    // "short" bytes: s=115 h=104 o=111 r=114 t=116 -> mean 112.0
    assert(f(1)._3 == 112.0)
    assert(f(1)._4 == "73686f7274")
    assert(f(0)._2 == 128)
  }

  test("resize stub subsamples payload bytes deterministically") {
    val r = Multimodal.resizeStub(Multimodal.mediaFromDocs(docs), 4)
      .where(col("media_id") === 1)
      .select("payload", "n_bytes").collect().head
    // "short" (5 bytes) at factor 4 -> bytes at offsets 0 and 4: 's','t'
    assert(r.getInt(1) == 2)
    assert(new String(r.getAs[Array[Byte]](0)) == "st")
  }

  test("frame sampling yields expected frame counts and frame bytes") {
    val fr = Multimodal.frameSample(Multimodal.mediaFromDocs(docs), 64, 16)
      .select("media_id", "n_frames").as[(Long, Int)].collect().sortBy(_._1)
    assert(fr.toSeq == Seq((0L, 5), (1L, 0), (2L, 1))) // (128-64)/16+1 = 5
    val frames = Multimodal.frameSample(Multimodal.mediaFromDocs(docs), 64, 16)
      .where(col("media_id") === 2).select("frames")
      .as[Seq[Array[Byte]]].collect().head
    assert(frames.length == 1 && frames.head.length == 64)
  }

  test("PPM decode: real pixel math over a hand-built P6 payload") {
    // 2x1 image: pixel0 = (10, 20, 30), pixel1 = (40, 50, 255)
    val raster = Array(10, 20, 30, 40, 50, 255).map(_.toByte)
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    val media = Seq((7L, "image", ppm)).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeImages(media).collect().head
    assert(r.getInt(3) == 2 && r.getInt(4) == 1)
    assert(r.getDouble(5) == 25.0)   // (10+40)/2
    assert(r.getDouble(6) == 35.0)   // (20+50)/2
    assert(r.getDouble(7) == 142.5)  // (30+255)/2
  }

  test("PPM decode: comment headers parse, malformed payloads yield nulls") {
    val withComment = ("P6\n# a comment line\n 1 1 # trailing\n255\n"
      .getBytes("US-ASCII")) ++ Array(1, 2, 3).map(_.toByte)
    val truncated = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array(1.toByte)
    val sixteenBit = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++
      Array.fill(6)(0.toByte)
    val media = Seq(
      (1L, "image", withComment),
      (2L, "image", truncated),
      (3L, "image", sixteenBit),
      (4L, "image", "not a ppm at all".getBytes("US-ASCII")))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.decodeImages(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(3) == 1 && rows(1L).getDouble(5) == 1.0)
    assert(Seq(2L, 3L, 4L).forall(id => rows(id).isNullAt(3)))
  }

  test("PPM resize: nearest-neighbor subsample re-encodes a valid PPM") {
    // 3x3 image, pixel (x,y) = (10x+y, 100+x, 200+y); factor 2 keeps
    // pixels (0,0),(2,0),(0,2),(2,2)
    val px = Array.tabulate(3 * 3 * 3) { i =>
      val p = i / 3; val ch = i % 3; val x = p % 3; val y = p / 3
      (ch match { case 0 => 10 * x + y; case 1 => 100 + x; case 2 => 200 + y })
        .toByte
    }
    val media = Seq((1L, "image",
      "P6\n3 3\n255\n".getBytes("US-ASCII") ++ px))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.resizeImages(media, 2).collect().head
    assert(r.getInt(3) == 2 && r.getInt(4) == 2)
    // decode the re-encoded payload: kept pixels are (0,0),(2,0),(0,2),(2,2)
    val d = Multimodal.decodeImages(
      Seq((1L, "image", r.getAs[Array[Byte]](2)))
        .toDF("media_id", "kind", "payload")).collect().head
    assert(d.getInt(3) == 2 && d.getInt(4) == 2)
    assert(d.getDouble(5) == (0 + 20 + 2 + 22) / 4.0)   // R = 10x+y
    assert(d.getDouble(6) == (100 + 102 + 100 + 102) / 4.0) // G = 100+x
    assert(d.getDouble(7) == (200 + 200 + 202 + 202) / 4.0) // B = 200+y
    // non-PPM payloads keep the byte-subsampling stub with null dims
    val stub = Multimodal.resizeImages(
      Seq((2L, "audio", "abcdefgh".getBytes("US-ASCII")))
        .toDF("media_id", "kind", "payload"), 4).collect().head
    assert(stub.isNullAt(3) && stub.isNullAt(4))
    assert(new String(stub.getAs[Array[Byte]](2)) == "ae")
  }

  test("planted PPM payloads decode to the closed-form channel means") {
    val planted = Multimodal.plantedPpm(docs)
    val decoded = Multimodal.decodeImages(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    // recompute the closed form driver-side and compare
    for (id <- Seq(0L, 1L, 2L)) {
      val w = 2 + (id % 3).toInt; val h = 2 + (id % 2).toInt
      val px = (0 until w * h * 3).map(i => (id * 7 + i * 13) % 256)
      val r = decoded(id)
      assert(r.getInt(3) == w && r.getInt(4) == h)
      val meanOf = (ch: Int) =>
        px.zipWithIndex.collect { case (v, i) if i % 3 == ch => v }
          .sum.toDouble / (w * h)
      assert(r.getDouble(5) == meanOf(0))
      assert(r.getDouble(6) == meanOf(1))
      assert(r.getDouble(7) == meanOf(2))
    }
  }

  test("WAV decode: real sample math over a hand-built PCM16 payload") {
    // stereo, 3 frames at 8kHz: samples (100,-100, 200,-200, 300,-32768)
    val samples = Array[Short](100, -100, 200, -200, 300, -32768)
    val wav = Multimodal.wavBytes(8000, 2, samples)
    assert(wav.length == 44 + 12)
    val media = Seq((7L, "audio", wav)).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeAudio(media).collect().head
    assert(r.getInt(3) == 8000 && r.getInt(4) == 2)
    assert(r.getLong(5) == 3L)                  // frames per channel
    assert(r.getLong(6) == 3L * 1000 / 8000)    // 0 ms — sub-ms clip
    assert(r.getInt(7) == 32768)                // |−32768| kept exactly
    val sumSq = samples.map(s => s.toLong * s).sum
    assert(r.getDouble(8) == math.sqrt(sumSq.toDouble / 6))
  }

  test("WAV decode: unknown chunks skip, malformed payloads yield nulls") {
    val base = Multimodal.wavBytes(44100, 1, Array[Short](5, -5))
    // splice a LIST chunk (odd size 3 → padded to 4) between fmt and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 'a', 'b', 'c', 0)
    val spliced = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    val truncated = base.slice(0, base.length - 1)
    val eightBit = base.clone(); eightBit(34) = 8 // bits-per-sample
    val media = Seq(
      (1L, "audio", spliced),
      (2L, "audio", truncated),
      (3L, "audio", eightBit),
      (4L, "audio", "not audio".getBytes("US-ASCII")))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.decodeAudio(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(3) == 44100 && rows(1L).getLong(5) == 2L)
    assert(rows(1L).getInt(7) == 5)
    assert(Seq(2L, 3L, 4L).forall(id => rows(id).isNullAt(3)))
  }

  test("planted WAV payloads decode to the closed-form sample stats") {
    val planted = Multimodal.plantedWav(docs)
    val decoded = Multimodal.decodeAudio(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 2L)) {
      val ch = 1 + (id % 2).toInt
      val frames = 50 + (id % 20).toInt
      val vs = (0 until frames * ch).map(i => (id * 31 + i * 17) % 4001 - 2000)
      val r = decoded(id)
      assert(r.getInt(3) == 8000 && r.getInt(4) == ch)
      assert(r.getLong(5) == frames.toLong)
      assert(r.getLong(6) == frames * 1000L / 8000)
      assert(r.getInt(7) == vs.map(math.abs).max)
      val sumSq = vs.map(v => v * v).sum
      assert(r.getDouble(8) == math.sqrt(sumSq.toDouble / (frames * ch)))
      assert(r.getInt(2) == 44 + frames * ch * 2)
    }
  }

  test("featurize stub emits deterministic fixed-width float vectors that feed the ANN ops") {
    val m = Multimodal.featurizeStub(Multimodal.mediaFromDocs(docs), dim = 8)
    val vs = m.select("media_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(vs.forall(_._2.length == 8))
    assert(vs.forall(_._2.forall(x => x >= 0f && x <= 1f)))
    // deterministic across evaluations
    val again = Multimodal.featurizeStub(Multimodal.mediaFromDocs(docs), 8)
      .select("media_id", "embedding").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(vs.toSeq == again.toSeq)
    // and the output plugs straight into the similarity surface
    val q = vs.head._2.toArray
    val topk = graft.ops.Similarity.bruteForceTopK(
      m.select(col("media_id").as("vec_id"), col("embedding")),
      "vec_id", "embedding", q, 2).collect()
    assert(topk.length == 2 && topk.head.getLong(0) == vs.head._1)
  }

  test("y4m decode: real luma math over a hand-built mono payload") {
    // 2x2 mono, 2 frames: frame 0 luma (10,20,30,40), frame 1 (0,0,0,200)
    val clip = Multimodal.y4mBytes(2, 2, 25, 1, Array(
      Array(10, 20, 30, 40).map(_.toByte),
      Array(0, 0, 0, 200.toByte).map(_.toByte)))
    val media = Seq((7L, "video", clip)).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeVideo(media).collect().head
    assert(r.getInt(3) == 2 && r.getInt(4) == 2)         // width, height
    assert(r.getInt(5) == 25 && r.getInt(6) == 1)        // fps
    assert(r.getLong(7) == 2L)                           // frames
    assert(r.getLong(8) == 2L * 1000 * 1 / 25)           // 80 ms
    assert(r.getInt(9) == 200)                           // peak
    assert(r.getDouble(10) == (10 + 20 + 30 + 40 + 200) / 8.0)
  }

  test("y4m decode: 420 chroma skips; malformed payloads yield nulls") {
    // hand-built C420 2x2: luma 4 bytes + U 1 + V 1 per frame; the
    // chroma bytes carry 255 and must NOT contaminate the luma stats
    val c420 = "YUV4MPEG2 W2 H2 F30:1 C420\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4) ++ Array(255, 255).map(_.toByte)
    val truncated = {
      val full = Multimodal.y4mBytes(2, 2, 25, 1,
        Array(Array[Byte](1, 2, 3, 4)))
      full.slice(0, full.length - 1)
    }
    val oddDim420 = "YUV4MPEG2 W3 H2 F25:1 C420\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(9)(1.toByte)
    val noFps = "YUV4MPEG2 W2 H2\nFRAME\n".getBytes("US-ASCII") ++
      Array.fill(6)(1.toByte)
    val media = Seq(
      (1L, "video", c420),
      (2L, "video", truncated),
      (3L, "video", oddDim420),
      (4L, "video", noFps),
      (5L, "video", "not a y4m".getBytes("US-ASCII")))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.decodeVideo(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(3) == 2 && rows(1L).getInt(5) == 30)
    assert(rows(1L).getInt(9) == 4)                      // chroma skipped
    assert(rows(1L).getDouble(10) == (1 + 2 + 3 + 4) / 4.0)
    assert(Seq(2L, 3L, 4L, 5L).forall(id => rows(id).isNullAt(3)))
  }

  test("y4m decode: Int-overflow frame dimensions are malformed, not a " +
      "task crash") {
    // W46341*H46341 wraps w*h negative in Int: the negative frameLen
    // previously slipped past the truncation checks and the parser
    // crashed the executor with ArrayIndexOutOfBoundsException;
    // W65536*H65536 wraps to exactly 0 and silently parsed garbage.
    // Both must decode as malformed (null stats) — the parser's
    // documented contract over crawl dumps (r11 self-review)
    val wrapNeg = "YUV4MPEG2 W46341 H46341 F25:1 Cmono\nFRAME\n"
      .getBytes("US-ASCII") ++ Array.fill(64)(7.toByte)
    val wrapZero = "YUV4MPEG2 W65536 H65536 F25:1 Cmono\nFRAME\n"
      .getBytes("US-ASCII") ++ Array.fill(64)(7.toByte)
    val media = Seq((1L, "video", wrapNeg), (2L, "video", wrapZero))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.decodeVideo(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(3) && rows(2L).isNullAt(3))
  }

  test("frameSample rejects degenerate frameSize/stride") {
    val media = Seq((1L, "bin", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.frameSample(media, 2, 0) }
    intercept[IllegalArgumentException] {
      graft.ops.Multimodal.frameSample(media, 0, 2) }
  }

  test("planted y4m payloads decode to the closed-form frame stats") {
    val planted = Multimodal.plantedY4m(docs)
    val decoded = Multimodal.decodeVideo(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 2L)) {
      val w = 2 + (id % 3).toInt; val h = 2 + (id % 2).toInt
      val nf = 3 + (id % 4).toInt
      val vs = for (f <- 0 until nf; i <- 0 until w * h)
        yield (id * 7 + f * 11 + i * 13) % 256
      val r = decoded(id)
      assert(r.getInt(3) == w && r.getInt(4) == h)
      assert(r.getInt(5) == 25 && r.getInt(6) == 1)
      assert(r.getLong(7) == nf.toLong)
      assert(r.getLong(8) == nf * 1000L / 25)
      assert(r.getInt(9) == vs.max)
      assert(r.getDouble(10) == vs.sum.toDouble / (nf * w * h))
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".length
      assert(r.getInt(2) == header + nf * (6 + w * h))
    }
  }

  test("sampleVideoFrames emits every Nth frame with per-frame luma stats") {
    // 1x2 mono, 5 frames; frame f carries luma (f, 10f)
    val clip = Multimodal.y4mBytes(1, 2, 25, 1, Array.tabulate(5)(f =>
      Array(f, 10 * f).map(_.toByte)))
    val media = Seq(
      (1L, "video", clip),
      (2L, "video", "not a y4m".getBytes("US-ASCII")))
      .toDF("media_id", "kind", "payload")
    val fr = Multimodal.sampleVideoFrames(media, 2)
      .select("media_id", "frame_idx", "luma_sum", "luma_peak")
      .as[(Long, Int, Long, Int)].collect().sortBy(_._2)
    assert(fr.toSeq == Seq(                // frames 0, 2, 4; id 2 silent
      (1L, 0, 0L, 0), (1L, 2, 22L, 20), (1L, 4, 44L, 40)))
    // everyN = 1 keeps all frames, consistent with the whole-clip decode
    val all = Multimodal.sampleVideoFrames(media, 1).collect()
    assert(all.length == 5)
    val whole = Multimodal.decodeVideo(media.where(col("media_id") === 1))
      .collect().head
    assert(all.map(_.getLong(4)).sum ==
      math.round(whole.getDouble(10) * whole.getLong(7) * 1 * 2))
  }

  test("decodeAuto routes mixed payloads to the right codec in one pass") {
    val ppm = Multimodal.plantedPpm(Seq(10L).toDF("doc_id"))
      .select("media_id", "payload")
    val wav = Multimodal.plantedWav(Seq(11L).toDF("doc_id"))
      .select("media_id", "payload")
    val y4m = Multimodal.plantedY4m(Seq(12L).toDF("doc_id"))
      .select("media_id", "payload")
    val misc = Seq[(Long, Array[Byte])](
      (13L, "<html>x</html>".getBytes("US-ASCII")),
      (14L, "plain bytes".getBytes("US-ASCII")),
      (15L, "P6 but truncated".getBytes("US-ASCII")),
      (16L, null))
      .toDF("media_id", "payload")
    val auto = Multimodal.decodeAuto(
        ppm.unionByName(wav).unionByName(y4m).unionByName(misc))
      .collect().map(r => r.getLong(0) -> r).toMap
    // routing matches sniffKind
    assert(auto(10L).getString(1) == "image/ppm")
    assert(auto(11L).getString(1) == "audio/wav")
    assert(auto(12L).getString(1) == "video/y4m")
    assert(auto(13L).getString(1) == "text/html")
    assert(auto(14L).getString(1) == "application/octet-stream")
    assert(auto(15L).getString(1) == "image/ppm")   // sniffed, undecodable
    assert(auto(15L).isNullAt(3))                   // ...so stats null
    assert(auto(16L).isNullAt(1))
    // per-family stats agree with the dedicated decoders
    val img = Multimodal.decodeImages(
      ppm.withColumn("kind", lit("image"))).collect().head
    assert(auto(10L).getInt(3) == img.getInt(3) &&
      auto(10L).getDouble(5) == img.getDouble(5))
    val aud = Multimodal.decodeAudio(
      wav.withColumn("kind", lit("audio"))).collect().head
    assert(auto(11L).getInt(8) == aud.getInt(3) &&   // sample_rate
      auto(11L).getDouble(13) == aud.getDouble(8))   // rms
    val vid = Multimodal.decodeVideo(
      y4m.withColumn("kind", lit("video"))).collect().head
    assert(auto(12L).getLong(10) == vid.getLong(7) &&  // n_frames
      auto(12L).getDouble(14) == vid.getDouble(10))    // luma_mean
  }

  test("sniffKind classifies by magic bytes, not declared type") {
    import java.nio.charset.StandardCharsets.US_ASCII
    val wav = Multimodal.plantedWav(Seq(1L).toDF("doc_id"))
      .select("payload").as[Array[Byte]].head()
    val ppm = Multimodal.plantedPpm(Seq(2L).toDF("doc_id"))
      .select("payload").as[Array[Byte]].head()
    val rows = Seq[(Long, Array[Byte])](
      (1L, ppm),
      (2L, wav),
      (3L, "<html><p>x</p></html>".getBytes(US_ASCII)),
      (4L, "plain words".getBytes(US_ASCII)),
      (5L, "P6".getBytes(US_ASCII)),          // bare magic still sniffs
      (6L, "P".getBytes(US_ASCII)),           // truncated magic: not ppm
      (7L, "RIFFxxxxAVI ".getBytes(US_ASCII)),// RIFF but not WAVE
      (8L, "YUV4MPEG2 W2 H2".getBytes(US_ASCII)),
      (9L, null))
    val got = rows.toDF("id", "payload")
      .select($"id", Multimodal.sniffKind($"payload").as("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "image/ppm", 2L -> "audio/wav", 3L -> "text/html",
      4L -> "application/octet-stream", 5L -> "image/ppm",
      6L -> "application/octet-stream",
      7L -> "application/octet-stream", 8L -> "video/y4m",
      9L -> null), s"got $got")
  }
}
