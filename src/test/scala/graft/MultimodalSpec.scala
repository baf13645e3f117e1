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

  test("png codec: real imageio decode matches the closed-form pixel stats") {
    val codec = new Multimodal.PngCodec
    for (id <- Seq(0L, 1L, 42L, 255L, 256L, 9999L)) {
      val bytes = Multimodal.syntheticPng(id)
      // a real PNG container, not a stand-in
      assert(bytes.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      val f = codec.decode(bytes).get
      val a = Array.tabulate(3)(c => ((id * (3 + 2 * c) + 11 + 17 * c) % 256).toDouble)
      val b = Array.tabulate(3)(c => ((id * (7 + 4 * c) + 5 + 23 * c) % 256).toDouble)
      assert(f(0) == 8f && f(1) == 8f)
      for (c <- 0 until 3) {
        assert(f(2 + c).toDouble == (a(c) + b(c)) / 2, s"mean ch$c id$id")
        assert(f(5 + c).toDouble == math.abs(a(c) - b(c)) / 2, s"std ch$c id$id")
      }
    }
    // garbage bytes are undecodable, not a crash
    assert(codec.decode("not a png".getBytes).isEmpty)
    assert(codec.decode(Array.emptyByteArray).isEmpty)
  }

  test("png payload attach + batched decode end-to-end") {
    val df = Seq((7L, "x"), (8L, "y")).toDF("doc_id", "text")
    val media = Multimodal.withPngMedia(df)
    assert(media.select("media_meta.mime").head().getString(0) == "image/png")
    val feats = Multimodal.decodeBatches(media, new Multimodal.PngCodec)
      .orderBy("doc_id").collect()
    assert(feats.length == 2)
    val f7 = feats.head.getAs[scala.collection.Seq[Float]]("features")
    assert(f7.length == 8 && f7(2) == ((7 * 3 + 11) % 256 + (7 * 7 + 5) % 256) / 2f)
  }
}
