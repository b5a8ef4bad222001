package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Multimodal.fromText(
    Seq((1L, "hello world of multimodal payloads"), (2L, "tiny")).toDF("id", "txt"),
    "id", "txt")

  test("media schema contract: binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.select("meta.modality", "meta.format").head()
    assert(meta.getString(0) == "image" && meta.getString(1) == "utf8")
  }

  test("payload byte length") {
    val n = media.filter($"media_id" === 1)
      .select(Multimodal.payloadBytes($"payload")).head().getLong(0)
    assert(n == "hello world of multimodal payloads".length)
  }

  test("frame sampling: first slice at offset 0, slices are hex of payload bytes") {
    val slices = media.filter($"media_id" === 1)
      .select(Multimodal.sampleSlices($"payload", 3, 4).as("s"))
      .head().getSeq[String](0)
    assert(slices.length == 3)
    assert(slices.head == "68656c6c") // "hell"
  }

  test("stub decoder: deterministic fixed-size features via mapPartitions") {
    val out = Multimodal.extractFeatures(media)
    assert(out.schema("features").dataType.simpleString == "array<float>")
    val f1 = out.filter($"media_id" === 1).select("features").head().getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(media)
      .filter($"media_id" === 1).select("features").head().getSeq[Float](0)
    assert(f1.length == Multimodal.StubDecoder.FeatureDim)
    assert(f1 == f2) // deterministic
    assert(f1.forall(v => v >= 0.0f && v <= 1.0f))
    // matches a local recomputation from the same bytes
    val local = Multimodal.StubDecoder.features(
      "hello world of multimodal payloads".getBytes("UTF-8"))
    assert(f1 == local.toSeq)
  }
}
