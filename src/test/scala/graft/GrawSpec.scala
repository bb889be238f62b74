package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** GRAW container semantics: the parser really reads the header it
  * wrote, rejects malformed payloads (falling back to the legacy
  * derivation), and the resize kernel selects hand-computable source
  * pixels.
  */
class GrawSpec extends AnyFunSuite {

  test("encode -> parse round-trips the header for any source size") {
    for (n <- Seq(1, 8, 57, 58, 100, 4096)) {
      val src = Array.tabulate(n)(i => (i % 251).toByte)
      val g = Multimodal.encodeGraw(src)
      val (w, h, f) = Multimodal.parseGraw(g).get
      assert(w == 8 + n % 57 && h == 8 + (n * 3) % 41 && f == 1 + n % 4)
      assert(g.length == Multimodal.GrawHeader + w * h * f)
      // pixels are the source cycled
      assert(g(Multimodal.GrawHeader) == src(0))
      assert(g(Multimodal.GrawHeader + w * h * f - 1) ==
        src((w * h * f - 1) % n))
    }
  }

  test("malformed payloads fall back to the legacy derivation") {
    // wrong magic
    assert(Multimodal.parseGraw("XRnope".getBytes).isEmpty)
    // right magic, wrong pixel count
    val bad = Array[Byte]('G', 'R', 0, 2, 0, 2, 1, 9, 9)
    assert(Multimodal.parseGraw(bad).isEmpty)
    val (w, h, f) = Multimodal.decodeBytes(bad)
    assert(w == (1 + bad.length % 1024) && h == (1 + (bad.length * 7) % 768)
      && f == (1 + bad.length % 16))
  }

  test("nearest resize picks the hand-computed source pixels") {
    // 4x4 frame with pixel value = its index; 2x2 thumb picks
    // (x*4/2, y*4/2) = rows 0,2 x cols 0,2 -> values 0,2,8,10
    val frame = Array.tabulate(16)(_.toByte)
    val t = Multimodal.nearestResize(frame, 4, 4, 2, 2)
    assert(t.toSeq == Seq[Byte](0, 2, 8, 10))
    // upscale 2x2 -> 4x4 repeats each pixel in 2x2 blocks
    val up = Multimodal.nearestResize(Array[Byte](1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2,
      3, 3, 4, 4, 3, 3, 4, 4))
  }
}
