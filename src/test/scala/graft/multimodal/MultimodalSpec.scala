package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real-codec path: ImageIO decode of genuine image bytes must recover
  * exact dimensions and (for gray pixels, where BT.601 luma is exact) the
  * original pixel values; non-image payloads must fall back to passthrough. */
class MultimodalSpec extends AnyFunSuite {

  test("decode recovers exact pixels and dims from a real PNG") {
    val v = (i: Int) => (i * 37 + 11) % 256
    val png = Multimodal.encodeGrayPng(8, 5, v)
    // PNG magic bytes prove this is a real container, not a passthrough
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val d = Multimodal.decode(png)
    assert(d.isImage && d.width == 8 && d.height == 5)
    assert(d.bytes.length == 40)
    (0 until 40).foreach(i => assert((d.bytes(i) & 0xff) == v(i), s"pixel $i"))
  }

  test("resizePixels keeps exactly the nearest-neighbor source pixels") {
    val v = (i: Int) => (i * 53 + 5) % 256
    val png = Multimodal.encodeGrayPng(16, 16, v)
    val small = Multimodal.resizePixels(png, 8, 8).get
    val d = Multimodal.decode(small)
    assert(d.isImage && d.width == 8 && d.height == 8)
    (0 until 64).foreach { j =>
      val src = 32 * (j / 8) + 2 * (j % 8)
      assert((d.bytes(j) & 0xff) == v(src), s"out pixel $j != source $src")
    }
    assert(Multimodal.resizePixels("not an image".getBytes, 8, 8).isEmpty)
  }

  test("animated GIF demux recovers every frame pixel-exactly, in order") {
    val v = (f: Int, i: Int) => (f * 41 + i * 13 + 7) % 256
    val gif = Multimodal.encodeGrayGif(6, 4, 3, v)
    assert(new String(gif, 0, 3, "US-ASCII") == "GIF") // real container
    val frames = Multimodal.demuxFrames(gif)
    assert(frames.length == 3)
    frames.zipWithIndex.foreach { case (d, f) =>
      assert(d.width == 6 && d.height == 4)
      (0 until 24).foreach(i =>
        assert((d.bytes(i) & 0xff) == v(f, i), s"frame $f pixel $i"))
    }
    assert(Multimodal.demuxFrames("not media".getBytes).isEmpty)
  }

  test("audio WAV round-trip recovers exact PCM samples and format") {
    val pcm = Array.tabulate[Byte](100)(i => ((i * 29 + 3) % 256).toByte)
    val wav = Multimodal.encodeWav(pcm, 8000f)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF") // real WAV container
    val d = Multimodal.decodeAudio(wav).get
    assert(d.sampleRate == 8000.0 && d.channels == 1)
    assert(d.samples.sameElements(pcm))
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("decode falls back to byte passthrough for non-image payloads") {
    val raw = "definitely not an image".getBytes("UTF-8")
    val d = Multimodal.decode(raw)
    assert(!d.isImage && d.width == -1 && d.height == -1)
    assert(d.bytes.sameElements(raw))
  }
}
