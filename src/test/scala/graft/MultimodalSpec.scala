package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import sqlImplicits._
    Seq(
      (0L, "payload zero", "en"), (1L, "a bigger payload one", "en"),
      (2L, "payload two", "es"), (3L, "payload three", "en"))
      .toDF("doc_id", "text", "lang")
  }

  test("synthesized media carries the payload bytes and cycled mime") {
    implicit val s = spark
    val m = Multimodal.synthesizeMedia(docs).collect().map(f => f.doc_id -> f).toMap
    assert(new String(m(0L).payload, "UTF-8") == "payload zero")
    assert(m(0L).mime == "image/png" && m(1L).mime == "audio/wav" && m(2L).mime == "video/mp4")
  }

  test("synthesizeMedia: null text gets an empty payload; negative ids cycle mimes") {
    import sqlImplicits._
    implicit val s = spark
    val df = Seq(
      (7L, Some("hello")), (8L, None),          // null text
      (-1L, Some("neg")), (-2L, Some("neg2")))  // negative ids
      .toDF("doc_id", "text")
    val m = Multimodal.synthesizeMedia(df).collect().map(f => f.doc_id -> f).toMap
    // a NULL payload NPEs at the decode boundary's header probes —
    // null text must synthesize EMPTY bytes instead
    assert(m(8L).payload.length == 0, "null text must yield an empty payload, not null")
    // % on a negative id indexed 0 (runtime error) or -1 (wrong mime)
    assert(m(-1L).mime == "video/mp4" && m(-2L).mime == "audio/wav",
      s"pmod cycling: ${m(-1L).mime}, ${m(-2L).mime}")
    // the empty payload flows through the full decode boundary
    val meta = Multimodal.extractMeta(Multimodal.synthesizeMedia(df)).collect()
    assert(meta.length == 4, "every row must decode (stub path for empty payloads)")
  }

  test("stubbed decode is deterministic and batched per partition") {
    implicit val s = spark
    val meta1 = Multimodal.extractMeta(Multimodal.synthesizeMedia(docs)).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.extractMeta(Multimodal.synthesizeMedia(docs.repartition(3))).collect().sortBy(_.doc_id)
    assert(meta1.toSeq == meta2.toSeq) // partitioning must not change results
    assert(meta1.forall(m => m.width >= 16 && m.height >= 16 && m.n_frames >= 1))
    assert(meta1.map(_.checksum).distinct.length == 4)
  }

  test("frame sampling emits at most maxFrames evenly spaced frames") {
    implicit val s = spark
    val meta = Multimodal.extractMeta(Multimodal.synthesizeMedia(docs))
    val frames = Multimodal.sampleFrames(meta, maxFrames = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc.values.forall(f => f.length >= 1 && f.length <= 4))
    assert(frames.forall(f => f.frame_key.nonEmpty))
  }

  test("pipeline summary rolls up per mime") {
    val sum = Multimodal.pipelineSummary(docs)(spark).collect()
    assert(sum.length == 3)
    assert(sum.map(_.getLong(1)).sum == 4) // all four files accounted for
  }

  test("stub features are unit-norm, fixed-width, and deterministic") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val meta = Multimodal.extractMeta(Multimodal.synthesizeMedia(docs))
    val f1 = Multimodal.extractFeaturesStub(meta).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeaturesStub(meta).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 == f2) // deterministic across runs
    f1.values.foreach { v =>
      assert(v.length == 16)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    }
  }

  /** Minimal valid 24-bit BMP: 54-byte header + padded pixel rows. */
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
      .putInt(40).putInt(w).putInt(h)     // BITMAPINFOHEADER
      .putShort(1).putShort(24)           // planes, bpp
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until dataSize).foreach(i => buf.put((i % 251).toByte))
    buf.array()
  }

  /** Minimal PCM WAV: RIFF/fmt/data with the given geometry. */
  private def wavBytes(rate: Int, channels: Int, bitsPerSample: Int, nFrames: Int): Array[Byte] = {
    val block = channels * bitsPerSample / 8
    val dataSize = nFrames * block
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate).putInt(rate * block)
      .putShort(block.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    (0 until dataSize).foreach(i => buf.put((i % 13).toByte))
    buf.array()
  }

  test("BMP and WAV payloads take the real header-decode path") {
    implicit val s = spark
    import sqlImplicits._
    val media = Seq(
      (10L, "application/octet-stream", bmpBytes(33, 21)),
      (11L, "application/octet-stream", wavBytes(8000, 2, 16, 120)),
      (12L, "application/octet-stream", "not a container at all".getBytes("UTF-8")))
      .toDF("doc_id", "mime", "payload").as[Multimodal.MediaFile]
    val meta = Multimodal.extractMeta(media).collect().map(m => m.doc_id -> m).toMap
    // Real BMP parse: exact planted dimensions, single frame, detected mime.
    assert(meta(10L).mime == "image/bmp")
    assert((meta(10L).width, meta(10L).height, meta(10L).n_frames) == ((33, 21, 1)))
    // Real WAV parse: rate/channels/sample-frame count from the chunks.
    assert(meta(11L).mime == "audio/wav")
    assert((meta(11L).width, meta(11L).height, meta(11L).n_frames) == ((8000, 2, 120)))
    // Unrecognized payloads still flow through the documented stub.
    assert(meta(12L).mime == "application/octet-stream")
    assert(meta(12L).n_bytes == 22L)
  }

  test("top-down BMP (negative height) decodes to positive dimensions") {
    val p = bmpBytes(8, 4)
    val buf = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4) // legal top-down encoding
    val got = Multimodal.decodeBmp(Multimodal.MediaFile(1L, "x", p))
    assert(got.exists(m => m.width == 8 && m.height == 4))
  }

  test("malformed containers fall through to the stub instead of crashing") {
    // WAV whose first chunk declares a size near Int.MaxValue: an Int
    // offset walk would wrap negative and throw; the Long walk with
    // every-chunk-must-fit rejects it.
    val evil = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0x7ffffff0)
      .array()
    assert(Multimodal.decodeWav(Multimodal.MediaFile(1L, "x", evil)).isEmpty)
    // Truncated data chunk (declares more bytes than present) rejects
    // rather than overstating n_frames.
    val truncated = {
      val ok = wavBytes(8000, 1, 16, 10)
      java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(40, 9999)
      ok
    }
    assert(Multimodal.decodeWav(Multimodal.MediaFile(1L, "x", truncated)).isEmpty)
    // BMP with biHeight = Int.MinValue (abs() stays negative) rejects.
    val minH = bmpBytes(8, 4)
    java.nio.ByteBuffer.wrap(minH).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, Int.MinValue)
    assert(Multimodal.decodeBmp(Multimodal.MediaFile(1L, "x", minH)).isEmpty)
  }

  test("text that merely starts with the magic letters never false-positives") {
    val bm = Multimodal.decodeBmp(Multimodal.MediaFile(1L, "x",
      ("BM this text is long enough to clear the 54-byte header check " +
        "but has no null bytes anywhere").getBytes("UTF-8")))
    assert(bm.isEmpty)
    val rf = Multimodal.decodeWav(Multimodal.MediaFile(1L, "x",
      ("RIFF text that is long enough but lacks the WAVE tag and chunks " +
        "and therefore must be rejected").getBytes("UTF-8")))
    assert(rf.isEmpty)
  }

  test("synthesized containers round-trip through the real parsers (x49 basis)") {
    // Even id → BMP; id % 5 == 0 also exercises the stored-negative
    // (top-down) height. The parser must recover exactly the fields
    // the builder derived from the id — the invariant the x49 oracle
    // certifies corpus-wide.
    val bmp = Multimodal.decodeBmp(Multimodal.MediaFile(10L, "image/bmp", Multimodal.buildBmp(10L)))
    assert(bmp.isDefined)
    assert(bmp.get.width == 16 + 10 % 617)
    assert(bmp.get.height == 16 + (10 * 7) % 411) // abs of the negative stored height
    assert(bmp.get.n_bytes == 54 + 10 % 64)
    assert(bmp.get.n_frames == 1)
    // Odd id → WAV: rate/channels/frame-count recovered from the chunk walk.
    val wav = Multimodal.decodeWav(Multimodal.MediaFile(7L, "audio/wav", Multimodal.buildWav(7L)))
    assert(wav.isDefined)
    assert(wav.get.width == 8000 + (7 % 8) * 1000)
    assert(wav.get.height == 1 + (7 / 2) % 2)
    assert(wav.get.n_frames == 1 + 7 % 100)
    assert(wav.get.n_bytes == 44 + (2 * (1 + (7 / 2) % 2)) * (1 + 7 % 100))
  }

  test("image dHash: jittered twins pair, distinct seeds don't, header-only BMPs drop out") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions.col
    import sqlImplicits._
    val media = spark.createDataset(
      (1L to 40L).map(i => Multimodal.MediaFile(i, "image/bmp", Multimodal.buildBmpPixels(i))) ++
        Seq(
          // perceptual twin of seed 1: tiny phase jitter
          Multimodal.MediaFile(1000001L, "image/bmp", Multimodal.buildBmpPixels(1L, phase = 0.005)),
          // header-only container (the x49 kind): no pixels → no signature
          Multimodal.MediaFile(999999L, "image/bmp", Multimodal.buildBmp(2L))))
    val sigs = Multimodal.imageDHashes(media)
    assert(sigs.filter(col("doc_id") === 999999L).count() == 0)
    assert(sigs.count() == 41)
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 1000001L), s"planted twin missed: $pairs")
    // distinct seeds reshape the field — no cross-seed pair at ≤ 3
    val cross = pairs.filterNot(p => p._1 == 1L && p._2 == 1000001L)
    assert(cross.isEmpty, s"unexpected cross-seed pairs: $cross")
  }

  test("audio fingerprint: jittered twins pair, distinct seeds don't, silent WAVs drop out") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions.col
    import sqlImplicits._
    val media = spark.createDataset(
      (1L to 40L).map(i => Multimodal.MediaFile(i, "audio/wav", Multimodal.buildWavSamples(i))) ++
        Seq(
          // carrier-phase jitter preserves the energy envelope
          Multimodal.MediaFile(1000003L, "audio/wav", Multimodal.buildWavSamples(3L, phase = 0.01)),
          // zero-sample container (the x49 kind): silent → no signature
          Multimodal.MediaFile(999999L, "audio/wav", Multimodal.buildWav(7L))))
    val sigs = Multimodal.audioFingerprints(media)
    assert(sigs.filter(col("doc_id") === 999999L).count() == 0)
    assert(sigs.count() == 41)
    val pairs = Multimodal.audioNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists(p => p._1 == 3L && p._2 == 1000003L), s"planted twin missed: $pairs")
    val cross = pairs.filterNot(p => p._1 == 3L && p._2 == 1000003L)
    assert(cross.isEmpty, s"unexpected cross-seed pairs: $cross")
  }

  test("audio fingerprint is invariant to uniform gain") {
    // halving every sample scales all window energies by 1/4 —
    // delta signs unchanged
    val base = Multimodal.buildWavSamples(9L)
    val softer = base.clone()
    var fr = 0
    while (fr < 65 * 32) {
      val o = 44 + fr * 2
      val s = (((softer(o) & 0xff) | (softer(o + 1) << 8)).toShort / 2).toShort
      softer(o) = (s & 0xff).toByte; softer(o + 1) = ((s >> 8) & 0xff).toByte
      fr += 1
    }
    val h1 = Multimodal.afp64(Multimodal.MediaFile(1L, "audio/wav", base))
    val h2 = Multimodal.afp64(Multimodal.MediaFile(2L, "audio/wav", softer))
    assert(h1.isDefined && h1 == h2, s"$h1 vs $h2")
  }

  test("dHash is invariant to a uniform brightness shift") {
    // adding a constant to every pixel preserves all gradient signs
    val base = Multimodal.buildBmpPixels(5L)
    val brighter = base.clone()
    var i = 54
    while (i < brighter.length) {
      brighter(i) = math.min(255, (brighter(i) & 0xff) + 20).toByte
      i += 1
    }
    val h1 = Multimodal.dhash64(Multimodal.MediaFile(1L, "image/bmp", base))
    val h2 = Multimodal.dhash64(Multimodal.MediaFile(2L, "image/bmp", brighter))
    assert(h1.isDefined && h1 == h2, s"$h1 vs $h2")
  }

  test("resize plan fits the box, preserves aspect ratio, never upscales") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import sqlImplicits._
    val meta = Seq(
      (1L, "image/png", 1280, 720),  // downscale, landscape
      (2L, "image/png", 720, 1280),  // downscale, portrait
      (3L, "image/png", 100, 50))    // already fits → untouched
      .toDF("doc_id", "mime", "width", "height")
    val out = Multimodal.resizePlan(meta, maxW = 336, maxH = 336)
      .collect().map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    assert(out(1L) == ((336, 189))) // 1280×720 · (336/1280)
    assert(out(2L) == ((189, 336)))
    assert(out(3L) == ((100, 50)))
  }
}
