package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the multimodal helpers' edges (the queries
  * themselves are oracle-checked by the driver).
  */
class MultimodalSpec extends AnyFunSuite {

  test("featurize: NULL and empty payloads are skipped, not crashes") {
    assert(Multimodal.featurize(1L, null).isEmpty)
    assert(Multimodal.featurize(2L, "").isEmpty)
  }

  test("featurize: entropy and ratios on known inputs") {
    // 4 equiprobable symbols → H = 2 bits exactly; all printable
    val f = Multimodal.featurize(1L, "abcd").get
    assert(f.byte_len == 4 && f.n_distinct_chars == 4)
    assert(f.char_entropy == 2.0 && f.printable_ratio == 1.0)
    // single repeated symbol → H = 0
    assert(Multimodal.featurize(2L, "aaaa").get.char_entropy == 0.0)
    // non-printable (newline) counted in the ratio denominator
    val g = Multimodal.featurize(3L, "ab\n\n").get
    assert(g.printable_ratio == 0.5)
    // multi-byte UTF-8: byte_len counts bytes, not chars
    assert(Multimodal.featurize(4L, "é").get.byte_len == 2L)
  }

  test("decodeStub is deterministic and hashes content") {
    val rec = Multimodal.MediaRecord(7L, "payload".getBytes("UTF-8"))
    val a = Multimodal.decodeStub(rec)
    val b = Multimodal.decodeStub(rec)
    assert(a == b)
    assert(a.byte_len == 7L)
    assert(a.content_hash.matches("[0-9a-f]{32}"))
  }
}
