package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("FakeCodec.decode: mean and 16-bin histogram of bytes") {
    val (mean, hist) = FakeCodec.decode(Array[Byte](0, 16, 32, 0x7f))
    assert(mean == (0 + 16 + 32 + 127) / 4.0)
    assert(hist(0) == 1 && hist(1) == 1 && hist(2) == 1 && hist(7) == 1 && hist.sum == 4)
    assert(FakeCodec.decode(Array.empty[Byte])._1 == 0.0)
  }

  test("FakeCodec.embed is deterministic, fixed-width, in [0,1)") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val e1 = FakeCodec.embed(bytes)
    val e2 = FakeCodec.embed(bytes)
    assert(e1.toSeq == e2.toSeq && e1.length == 8)
    assert(e1.forall(v => v >= 0f && v < 1f))
  }

  test("sampleFrames keeps every other stride window") {
    val frames = FakeCodec.sampleFrames(Array.tabulate[Byte](300)(_.toByte), 64).toSeq
    // windows: 64,64,64,64,44 → kept idx 0,2,4
    assert(frames.map(_.length) == Seq(64, 64, 44))
  }

  test("extractFeatures runs per-partition over a typed Dataset") {
    val rows = Seq(
      MediaRow(1L, "image", "abc".getBytes("UTF-8"), 640, 480, 0, 0L),
      MediaRow(2L, "audio", "defg".getBytes("UTF-8"), 0, 0, 16000, 1000L))
    val out = Multimodal.extractFeatures(rows.toDS()).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).n_bytes == 3 && out(0).byte_mean == ('a' + 'b' + 'c') / 3.0)
    assert(out(0).histogram.sum == 3 && out(0).embedding.length == 8)
  }
}
