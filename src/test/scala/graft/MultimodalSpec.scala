package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text")

  test("media payload + typed metadata + content hash") {
    val r = Multimodal.mediaStats(docs).head()
    assert(r.getAs[Long]("n_bytes") == 16)
    assert(r.getAs[String]("media_sha").matches("[0-9a-f]{64}"))
  }

  test("frame sampling slices the payload deterministically") {
    val frames = Multimodal.frameSample(docs, frameBytes = 4, stride = 1).collect()
    assert(frames.length == 4)
    val first = new String(frames.head.getAs[Array[Byte]]("frame"), "UTF-8")
    assert(first == "abcd")
  }

  test("downsample keeps every k-th byte") {
    val small = Multimodal.downsample(docs, factor = 4).head()
      .getAs[Array[Byte]]("media_small")
    assert(new String(small, "UTF-8") == "aeim")
  }

  test("batched codec decode: one codec per partition, undecodable dropped") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.decodeBatches(df, new Multimodal.FakeCodec(8)).collect()
    assert(feats.length == 1) // empty payload undecodable
    val f = feats.head.getAs[scala.collection.Seq[Float]]("features")
    assert(f.length == 8 && math.abs(f.sum - 1.0f) < 1e-5)
  }

  test("stubbed feature extraction emits fixed-width float vectors") {
    val f = Multimodal.fakeFeatures(docs, dim = 8).head()
      .getAs[scala.collection.Seq[Float]]("features")
    assert(f.length == 8 && f.head == 'a'.toFloat)
  }
}
