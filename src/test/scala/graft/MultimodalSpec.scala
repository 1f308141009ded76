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
