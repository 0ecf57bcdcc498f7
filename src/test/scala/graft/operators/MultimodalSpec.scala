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

  test("opaque fallback is honest: real length+hash, no invented dimensions") {
    val rec = Multimodal.MediaRecord(7L, "payload".getBytes("UTF-8"))
    val a = Multimodal.RealDecoders.opaque(rec)
    assert(a == Multimodal.RealDecoders.opaque(rec))
    assert(a.byte_len == 7L)
    assert(a.width == 0L && a.height == 0L && a.n_frames == 0L)
    assert(a.content_hash.matches("[0-9a-f]{32}"))
  }

  test("decodePpm: real parser reads dimensions from handcrafted P6 bytes") {
    import Multimodal.{MediaRecord, RealDecoders}
    val header = "P6\n# a comment\n5 3\n255\n".getBytes("US-ASCII")
    val raster = Array.fill(5 * 3 * 3)(0x7f.toByte)
    val m = RealDecoders.decodePpm(MediaRecord(1L, header ++ raster)).get
    assert(m.width == 5 && m.height == 3 && m.n_frames == 1)
    assert(m.byte_len == (header.length + raster.length).toLong)
    // truncated raster or wrong magic is rejected, not misread
    assert(RealDecoders.decodePpm(MediaRecord(2L, header ++ raster.take(10))).isEmpty)
    assert(RealDecoders.decodePpm(MediaRecord(3L, "P5 junk".getBytes)).isEmpty)
  }

  test("decodeWav: real parser reads channels/rate/frames from RIFF bytes") {
    import Multimodal.{MediaRecord, RealDecoders}
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val dataBytes = Array.fill(400)(1.toByte)  // 100 frames @ 2ch 16-bit
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val data = "data".getBytes ++ le32(dataBytes.length) ++ dataBytes
    val riff = "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++
      "WAVE".getBytes ++ fmt ++ data
    val m = RealDecoders.decodeWav(MediaRecord(1L, riff)).get
    assert(m.width == 2 && m.height == 44100 && m.n_frames == 100)
    assert(RealDecoders.decodeWav(MediaRecord(2L, "RIFFjunk".getBytes)).isEmpty)
  }

  test("decode dispatch: sniffs real formats, falls back to opaque") {
    import Multimodal.{MediaRecord, RealDecoders}
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array.fill(3)(0.toByte)
    assert(RealDecoders.decode(MediaRecord(1L, ppm)).width == 1)
    val junk = MediaRecord(2L, "not media at all".getBytes)
    assert(RealDecoders.decode(junk) == RealDecoders.opaque(junk))
  }

  test("RealDecoders reject hostile/truncated inputs — no hangs, no throws") {
    import Multimodal.{MediaRecord, RealDecoders}
    // WAV with an unsigned chunk size that wraps negative in Int: the
    // chunk walk must return None, not stop advancing (infinite loop)
    val wrap = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array(0xF8, 0xFF, 0xFF, 0xFF).map(_.toByte)
    assert(RealDecoders.decodeWav(MediaRecord(1L, wrap)).isEmpty)
    // WAV declaring a data chunk far larger than the blob: truncation
    // must reject, not over-report a billion frames
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val trunc = "RIFF".getBytes ++ le32(1000) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32(1 << 30) ++ Array.fill(10)(0.toByte)
    assert(RealDecoders.decodeWav(MediaRecord(2L, trunc)).isEmpty)
    // PPM with a digit run longer than a Long: None, not
    // NumberFormatException escaping the Option contract
    assert(RealDecoders.decodePpm(
      MediaRecord(3L, "P6 99999999999999999999 1 255 ".getBytes)).isEmpty)
    // PPM whose dims overflow the raster-length product
    assert(RealDecoders.decodePpm(
      MediaRecord(4L, "P6 9000000 9000000 255 ".getBytes)).isEmpty)
    // and the dispatch still lands on the opaque record for every
    // rejected blob
    for ((b, id) <- Seq(wrap -> 5L, trunc -> 6L)) {
      val rec = MediaRecord(id, b)
      assert(RealDecoders.decode(rec) == RealDecoders.opaque(rec))
    }
  }

  test("MediaFixtures blobs are claimed by the REAL parsers, never the fallback") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders}
    for (id <- 0L until 200L) {
      val rec = MediaRecord(id, MediaFixtures.blobFor(id))
      (id % 4) match {
        case 0 =>
          val m = RealDecoders.decodePpm(rec)
            .getOrElse(fail(s"PPM fixture $id rejected by the PPM parser"))
          val (eff, scale) = MediaFixtures.ppmEff(id)
          assert(m.width == scale * (1 + eff % 47) &&
            m.height == scale * (1 + eff % 19))
          assert(m.n_frames == 1)
          assert(m.byte_len == rec.blob.length.toLong)
        case 1 =>
          assert(RealDecoders.decodePpm(rec).isEmpty, s"WAV fixture $id parsed as PPM")
          val m = RealDecoders.decodeWav(rec)
            .getOrElse(fail(s"WAV fixture $id rejected by the WAV parser"))
          assert(m.width == 1 + id % 3, "channels")
          assert(m.height == 8000 + (id % 5) * 1000, "sample rate")
          assert(m.n_frames == 10 + id % 50, "frame count")
        case 2 =>
          val m = RealDecoders.decodePng(rec)
            .getOrElse(fail(s"PNG fixture $id rejected by the PNG parser"))
          assert(m.width == 1 + id % 53 && m.height == 1 + id % 29)
          assert(m.n_frames == 1)
          // fixture CRCs are REAL: ImageIO-grade readers check them
          // even when our header probe doesn't
          val crc = new java.util.zip.CRC32()
          crc.update(rec.blob, 12, 4 + 13)  // IHDR type+data
          val stored = java.nio.ByteBuffer.wrap(rec.blob, 29, 4).getInt
          assert(stored == crc.getValue.toInt, "IHDR CRC mismatch")
          // the raster is REAL now: one decodable frame of w·h·3 bytes
          val frames = RealDecoders.sampledFrames(rec).toSeq
          assert(frames.map(f => (f._1, f._2)) == Seq((1L, 0L)))
          assert(frames.head._3.length == m.width.toInt * m.height.toInt * 3)
        case _ =>
          val m = RealDecoders.decodeJpeg(rec)
            .getOrElse(fail(s"JPEG fixture $id rejected by the JPEG parser"))
          // dims derive from the EFFECTIVE id (near-dup injection)
          val (eff, _) = MediaFixtures.jpegEff(id)
          assert(m.width == 1 + eff % 61 && m.height == 1 + eff % 37)
          assert(m.n_frames == 1)
          // the raster is REAL color now: one entropy-decoded frame of
          // w·h·3 RGB bytes (YCbCr 4:4:4 → RGB)
          val frames = RealDecoders.sampledFrames(rec).toSeq
          assert(frames.map(f => (f._1, f._2)) == Seq((1L, 0L)))
          assert(frames.head._3.length == m.width.toInt * m.height.toInt * 3)
      }
    }
  }

  test("near-dup injection: exact replicas are byte-identical, near-dups one byte off") {
    import Multimodal.MediaFixtures
    // id ≡ 19 (mod 20): byte-for-byte replay of id−8
    assert(java.util.Arrays.equals(MediaFixtures.jpeg(19L), MediaFixtures.jpeg(11L)))
    assert(java.util.Arrays.equals(MediaFixtures.jpeg(119L), MediaFixtures.jpeg(111L)))
    // id ≡ 15 (mod 20): same dims, exactly ONE scan byte differs.
    // eff = 7 lands in the 4:2:2 SUB-tier (eff % 8 = 7), where the
    // bump hits the LAST Y diff of MCU 0's two-block chain —
    // sub-block j=1, pixels y ∈ [0,8), x ∈ [8,16) — unless m(0,1)
    // was already 31
    val a = MediaFixtures.jpeg(7L); val b = MediaFixtures.jpeg(15L)
    assert(MediaFixtures.jpegSub422(7L))
    assert(a.length == b.length)
    val diffs = a.indices.filter(i => a(i) != b(i))
    val m01 = MediaFixtures.jpegSub422M(7L, nd = false, 0, 1)
    assert(diffs.size == (if (m01 == 31) 0 else 1), s"diffs at $diffs")
    // decoded rasters differ only inside Y sub-block j=1's region —
    // here EMPTY: the image is 8×8, so the perturbed block is MCU
    // padding (byte-level near-dup, pixel-identical — hamming 0)
    import Multimodal.RealDecoders
    val Some((w, h, 3, pa)) = RealDecoders.jpegRaster(a)
    val Some((w2, h2, 3, pb)) = RealDecoders.jpegRaster(b)
    assert(w == w2 && h == h2)
    val changed = (0 until pa.length / 3).filter { p =>
      (0 until 3).exists(c => pa(p * 3 + c) != pb(p * 3 + c))
    }
    assert(changed.forall { p =>
      val (y, x) = (p / w.toInt, p % w.toInt)
      y < 8 && x >= 8 && x < 16
    }, "perturbation leaked outside MCU 0's j=1 sub-block")
    // a 4:4:4-tier near-dup pair (id 35 → eff 27, 27 % 3 = 0) still
    // perturbs exactly block 0 in pixel space
    val a4 = MediaFixtures.jpeg(27L); val b4 = MediaFixtures.jpeg(35L)
    assert(!MediaFixtures.jpegSub(27L))
    val Some((w4, _, 3, pa4)) = RealDecoders.jpegRaster(a4)
    val Some((_, _, 3, pb4)) = RealDecoders.jpegRaster(b4)
    val changed4 = (0 until pa4.length / 3).filter { p =>
      (0 until 3).exists(c => pa4(p * 3 + c) != pb4(p * 3 + c))
    }
    assert(changed4.nonEmpty)
    assert(changed4.forall { p =>
      val (y, x) = (p / w4.toInt, p % w4.toInt); y < 8 && x < 8
    }, "444 perturbation leaked outside block 0")
  }

  /** The flat-plane pixel formulas the color fixture encodes — the
    * spec-side reference for block (eff, nd, k): (Y, Cb, Cr).
    */
  private def ycbcrOf(eff: Long, nd: Boolean, k: Int): (Int, Int, Int) = {
    val m0 = ((eff * 7 + k * 13) % 64).toInt
    val m = if (nd && k == 0) math.min(m0 + 1, 63) else m0
    val y = if ((eff + k) % 2 == 0) 192 + m else 64 - m
    val cbv = ((eff * 5 + k * 11) % 64).toInt
    val cb = if ((eff + k) % 3 == 0) 64 - cbv else 192 + cbv
    val crv = ((eff * 3 + k * 17) % 64).toInt
    val cr = if ((eff + k) % 5 == 0) 64 - crv else 192 + crv
    (y, cb, cr)
  }

  private def rgbOf(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v).toInt))
    (cl(y + 1.402 * (cr - 128) + 0.5),
      cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
      cl(y + 1.772 * (cb - 128) + 0.5))
  }

  test("jpegRaster decodes the color fixture: real Huffman + dequant + IDCT + YCbCr→RGB") {
    import Multimodal.{MediaFixtures, RealDecoders}
    // BASELINE 4:4:4 ids only (eff % 3 = 0); the 4:2:0 and progressive
    // sub-tiers have their own specs
    for (id <- Seq(3L, 111L, 59L)) {
      val b = MediaFixtures.jpeg(id)
      val (eff, nd) = MediaFixtures.jpegEff(id)
      assert(!MediaFixtures.jpegSub(eff) && !MediaFixtures.jpegProg(eff))
      val (w, h) = ((1 + eff % 61).toInt, (1 + eff % 37).toInt)
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 3)
      assert(px.length == w * h * 3)
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * bw + (x / 8)
        val (yy, cb, cr) = ycbcrOf(eff, nd, k)
        val (r, g, bb) = rgbOf(yy, cb, cr)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == ((r, g, bb)),
          s"id=$id y=$y x=$x")
      }
    }
  }

  test("jpegRaster decodes the 4:2:0 sub-tier: chained Y DPCM, NN chroma upsample") {
    import Multimodal.{MediaFixtures, RealDecoders}
    // eff % 3 = 1, eff % 8 = 3 throughout (the 4:2:2 half has its own
    // spec); 75 exercises the near-dup bump at m(0,3) over eff 67
    for (id <- Seq(43L, 67L, 91L, 75L)) {
      val b = MediaFixtures.jpeg(id)
      val (eff, nd) = MediaFixtures.jpegEff(id)
      assert(MediaFixtures.jpegSub(eff))
      val (w, h) = ((1 + eff % 61).toInt, (1 + eff % 37).toInt)
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 3)
      assert(px.length == w * h * 3)
      val nmcuX = (w + 15) / 16
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 16) * nmcuX + (x / 16)
        val j = ((y / 8) % 2) * 2 + (x / 8) % 2
        val yy = MediaFixtures.jpegSubYPix(eff, nd, k, j)
        // chroma: one flat 8×8 block per MCU, NN-upsampled over 16×16
        val (_, cb, cr) = ycbcrOf(eff, nd = false, k)
        val (r, g, bb) = rgbOf(yy, cb, cr)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == ((r, g, bb)),
          s"id=$id y=$y x=$x")
      }
    }
    // the near-dup pair (75 over 67) moves EXACTLY one 8×8 block's
    // luma by −1 (the LAST diff in MCU 0's chain) — visible only
    // where that sub-block has pixels (eff 67 is 7 wide, so here it
    // is MCU padding: byte-level near-dup, pixel-identical)
    val Some((_, _, _, p67)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(67L))
    val Some((_, _, _, p75)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(75L))
    val diffs = p67.indices.count(i => p67(i) != p75(i))
    assert(diffs <= 8 * 8 * 3,
      s"near-dup perturbation out of bounds: $diffs bytes differ")

    // 4:2:0-specific corruption refuses cleanly (never throws)
    val good = MediaFixtures.jpeg(43L)
    def flip(at: Int, to: Int): Array[Byte] = {
      val c = good.clone(); c(at) = to.toByte; c
    }
    // luma sampling 0x12 is outside every accepted shape (SOF comp 1
    // sampling byte sits at SOF segment offset +10 = 139 + 11)
    assert((good(150) & 0xff) == 0x22, "layout drifted: luma sampling")
    assert(RealDecoders.jpegRaster(flip(150, 0x12)).isEmpty)
    // relabeling the 4:2:0 scan as 4:2:2 desynchronizes its restart
    // cadence (4 blocks consumed where 6 were coded) — refuse
    assert(RealDecoders.jpegRaster(flip(150, 0x21)).isEmpty)
    // truncation mid-MCU (after two of the four Y entries)
    assert(RealDecoders.jpegRaster(good.take(172 + 4)).isEmpty)
    // a bare 0xFF on the third Y codeword
    assert(RealDecoders.jpegRaster(flip(172 + 4, 0xff)).isEmpty)
  }

  test("jpegRaster decodes the 4:2:2 sub-tier: two-block Y chain, 16×8 MCUs") {
    import Multimodal.{MediaFixtures, RealDecoders}
    // eff % 3 = 1, eff % 8 = 7 throughout: 103 generic, 31 an
    // exact-dup source, 39 its byte-replay, 7/15 a near-dup pair
    for (id <- Seq(103L, 31L, 39L, 7L, 15L)) {
      val b = MediaFixtures.jpeg(id)
      val (eff, nd) = MediaFixtures.jpegEff(id)
      assert(MediaFixtures.jpegSub422(eff))
      assert((b(150) & 0xff) == 0x21, "layout drifted: 2×1 luma sampling")
      val (w, h) = ((1 + eff % 61).toInt, (1 + eff % 37).toInt)
      val nb = ((w + 15) / 16) * ((h + 7) / 8)
      // the q66 byte-count formula for the 4:2:2 tier
      assert(b.length == 172 + 10 * nb, s"id=$id byte count ${b.length}")
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 3)
      assert(px.length == w * h * 3)
      val nmcuX = (w + 15) / 16
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * nmcuX + (x / 16)
        val j = (x / 8) % 2
        val yy = MediaFixtures.jpegSub422YPix(eff, nd, k, j)
        // chroma: one flat 8×8 block per MCU, NN-upsampled over 16×8
        val (_, cb, cr) = ycbcrOf(eff, nd = false, k)
        val (r, g, bb) = rgbOf(yy, cb, cr)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == ((r, g, bb)),
          s"id=$id y=$y x=$x")
      }
    }
    // the injected pairs: 39 replays 31 byte-for-byte; 15 perturbs 7
    // by one quant step on the LAST diff of MCU 0's two-block chain
    assert(java.util.Arrays.equals(
      MediaFixtures.jpeg(39L), MediaFixtures.jpeg(31L)))
    val Some((_, _, _, p7)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(7L))
    val Some((_, _, _, p15)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(15L))
    val diffs = p7.indices.count(i => p7(i) != p15(i))
    assert(diffs <= 8 * 8 * 3,
      s"near-dup perturbation out of bounds: $diffs bytes differ")

    // 4:2:2-specific corruption refuses cleanly
    val good = MediaFixtures.jpeg(31L) // 32×32: 2×4 = 8 MCUs
    def flip(at: Int, to: Int): Array[Byte] = {
      val c = good.clone(); c(at) = to.toByte; c
    }
    // 1×2 sampling is outside every accepted shape
    assert(RealDecoders.jpegRaster(flip(150, 0x12)).isEmpty)
    // relabeling the 4:2:2 scan as 4:2:0 desynchronizes its restart
    // cadence (6 blocks expected where 4 were coded) — refuse
    assert(RealDecoders.jpegRaster(flip(150, 0x22)).isEmpty)
    // truncation mid-MCU (after one of the two Y entries)
    assert(RealDecoders.jpegRaster(good.take(172 + 2)).isEmpty)
    // a bare 0xFF on the second Y codeword
    assert(RealDecoders.jpegRaster(flip(172 + 2, 0xff)).isEmpty)
  }

  test("jpegRaster decodes the PROGRESSIVE sub-tier: multi-scan, EOB-run AC bands") {
    import Multimodal.{MediaFixtures, RealDecoders}
    // SPECTRAL-only ids (eff % 8 = 3): 83 generic, 11 an exact-dup
    // source, 19 its byte-replay, 115 a near-dup consumer (eff 107);
    // the successive-approximation half (eff % 8 = 7) has its own spec
    for (id <- Seq(83L, 11L, 19L, 115L)) {
      val b = MediaFixtures.jpeg(id)
      val (eff, nd) = MediaFixtures.jpegEff(id)
      assert(MediaFixtures.jpegProg(eff) && !MediaFixtures.jpegProgSa(eff))
      assert((b(139) & 0xff) == 0xff && (b(140) & 0xff) == 0xc2,
        "layout drifted: SOF2 expected")
      val (w, h) = ((1 + eff % 61).toInt, (1 + eff % 37).toInt)
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 3)
      // the pixel CONTENT is the baseline 4:4:4 tier's — a progressive
      // re-encoding of the same image must decode to the same bytes
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * bw + (x / 8)
        val (yy, cb, cr) = ycbcrOf(eff, nd, k)
        val (r, g, bb) = rgbOf(yy, cb, cr)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == ((r, g, bb)),
          s"id=$id y=$y x=$x")
      }
    }
    // a DC-only truncation (drop the three AC scans, keep EOI) is the
    // spec-legal truncated render — and for DC-only content the SAME
    // image; decode must succeed, not refuse
    val good = MediaFixtures.jpeg(11L)
    val (w11, h11) = (1 + 11 % 61, 1 + 11 % 37)
    val nb11 = ((w11 + 7) / 8) * ((h11 + 7) / 8)
    val dcEnd = 158 + 14 + (5 * nb11 - 2) // header + SOS1 + DC scan
    assert((good(dcEnd) & 0xff) == 0xff && (good(dcEnd + 1) & 0xff) == 0xda,
      "layout drifted: AC SOS expected after the DC scan")
    // the q66 byte-count formula for the spectral progressive tier
    assert(good.length == 196 + 14 * nb11, s"byte count ${good.length}")
    val dcOnly = good.take(dcEnd) ++ Array(0xff.toByte, 0xd9.toByte)
    val Some((_, _, _, pxT)) = RealDecoders.jpegRaster(dcOnly)
    val Some((_, _, _, pxF)) = RealDecoders.jpegRaster(good)
    assert(java.util.Arrays.equals(pxT, pxF))

    // progressive-specific corruption refuses cleanly
    def flip(at: Int, to: Int): Array[Byte] = {
      val c = good.clone(); c(at) = to.toByte; c
    }
    // a REFINEMENT scan whose band was never first-scanned is
    // corruption, not a coarser render — the DC SOS's AhAl byte is
    // its last (offset 158+13)
    assert(RealDecoders.jpegRaster(flip(158 + 13, 0x10)).isEmpty)
    assert(RealDecoders.jpegRaster(flip(158 + 13, 0x21)).isEmpty)
    // ...but a FIRST scan at Al=1 is a legal coarse approximation:
    // the same bytes decode, to coarser (left-shifted-DC) pixels
    val coarse = RealDecoders.jpegRaster(flip(158 + 13, 0x01))
    assert(coarse.isDefined)
    assert(!java.util.Arrays.equals(coarse.get._4, pxF))
    // truncation MID-scan (no EOI) refuses
    assert(RealDecoders.jpegRaster(good.take(dcEnd - 2)).isEmpty)
    // a marker where a DC codeword must be
    assert(RealDecoders.jpegRaster(flip(172, 0xff)).isEmpty)
    // EOI with NO scan at all refuses
    val noScan = good.take(158) ++ Array(0xff.toByte, 0xd9.toByte)
    assert(RealDecoders.jpegRaster(noScan).isEmpty)
  }

  test("jpegRaster decodes the SUCCESSIVE-APPROXIMATION sub-tier: refinement scans") {
    import Multimodal.{MediaFixtures, RealDecoders}
    // eff % 8 = 7 throughout: 23 generic, 71 an exact-dup source, 79
    // its byte-replay, 47/55 a near-dup pair
    for (id <- Seq(23L, 71L, 79L, 47L, 55L)) {
      val b = MediaFixtures.jpeg(id)
      val (eff, nd) = MediaFixtures.jpegEff(id)
      assert(MediaFixtures.jpegProgSa(eff))
      assert((b(140) & 0xff) == 0xff && (b(141) & 0xff) == 0xc2,
        "layout drifted: SOF2 expected (SA header is one byte longer)")
      val (w, h) = ((1 + eff % 61).toInt, (1 + eff % 37).toInt)
      val nb = ((w + 7) / 8) * ((h + 7) / 8)
      // the SA byte-count formula (26 bytes/MCU over 8 scans)
      assert(b.length == 233 + 26 * nb, s"id=$id byte count ${b.length}")
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 3)
      // full decode: the pixel CONTENT is the baseline 4:4:4 tier's
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * bw + (x / 8)
        val (yy, cb, cr) = ycbcrOf(eff, nd, k)
        val (r, g, bb) = rgbOf(yy, cb, cr)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == ((r, g, bb)),
          s"id=$id y=$y x=$x")
      }
      // truncation tier 1: first DC scan only (Al=1) + EOI — the
      // spec-legal COARSE render: every DC value loses its low bit
      val dc1End = 159 + 14 + (5 * nb - 2)
      assert((b(dc1End) & 0xff) == 0xff && (b(dc1End + 1) & 0xff) == 0xda,
        "layout drifted: DC refinement SOS expected")
      val Some((_, _, _, pxC)) = RealDecoders.jpegRaster(
        b.take(dc1End) ++ Array(0xff.toByte, 0xd9.toByte))
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * bw + (x / 8)
        val (yy, cb, cr) = ycbcrOf(eff, nd, k)
        def c1(v: Int) = 128 + (((v - 128) >> 1) << 1)
        val (r, g, bb) = rgbOf(c1(yy), c1(cb), c1(cr))
        val o = (y * w + x) * 3
        assert((pxC(o) & 0xff, pxC(o + 1) & 0xff, pxC(o + 2) & 0xff) == ((r, g, bb)),
          s"coarse id=$id y=$y x=$x")
      }
      // truncation tier 2: DC first + DC refinement + EOI — full DC,
      // zero AC: the SAME image as the full 8-scan decode
      val dcREnd = dc1End + 14 + (3 * nb - 2)
      assert((b(dcREnd) & 0xff) == 0xff && (b(dcREnd + 1) & 0xff) == 0xda,
        "layout drifted: AC SOS expected")
      val Some((_, _, _, pxR)) = RealDecoders.jpegRaster(
        b.take(dcREnd) ++ Array(0xff.toByte, 0xd9.toByte))
      assert(java.util.Arrays.equals(pxR, px))
    }
    // the injected pairs: 79 replays 71 byte-for-byte; 55 perturbs 47
    // by one quant step in block 0's luma only
    assert(java.util.Arrays.equals(
      MediaFixtures.jpeg(79L), MediaFixtures.jpeg(71L)))
    val Some((_, _, _, p47)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(47L))
    val Some((_, _, _, p55)) = RealDecoders.jpegRaster(MediaFixtures.jpeg(55L))
    val diffs = p47.indices.count(i => p47(i) != p55(i))
    assert(diffs > 0 && diffs <= 8 * 8 * 3,
      s"near-dup perturbation out of bounds: $diffs bytes differ")

    // SA-specific corruption refuses cleanly
    val good = MediaFixtures.jpeg(23L)
    def flip(at: Int, to: Int): Array[Byte] = {
      val c = good.clone(); c(at) = to.toByte; c
    }
    val nb23 = ((24 + 7) / 8) * ((24 + 7) / 8)
    val dc1End = 159 + 14 + (5 * nb23 - 2)
    // the DC FIRST scan's AhAl at 159+13: a full-scale first scan
    // (Al=0) leaves the refinement's Ah=1 unmatched → refuse
    assert(RealDecoders.jpegRaster(flip(159 + 13, 0x00)).isEmpty)
    // refinement before any first scan → refuse
    assert(RealDecoders.jpegRaster(flip(159 + 13, 0x10)).isEmpty)
    // the DC REFINEMENT's AhAl (dc1End+13): a SECOND first scan over
    // an already-seen band → refuse; Ah ≠ Al+1 → refuse
    assert(RealDecoders.jpegRaster(flip(dc1End + 13, 0x01)).isEmpty)
    assert(RealDecoders.jpegRaster(flip(dc1End + 13, 0x20)).isEmpty)
    // truncation mid-refinement (no EOI) refuses
    assert(RealDecoders.jpegRaster(good.take(dc1End + 16)).isEmpty)
  }

  test("successive-approximation AC refinement: correction-bit protocol matches baseline") {
    import Multimodal.RealDecoders
    // ONE 8×8 gray block encoded two ways with the SAME final
    // quantized coefficients — DC=10; AC zigzag 1→3, 2→1, 5→−2,
    // 25→1 — once as a baseline scan, once as four SA scans whose
    // refinement pass exercises every protocol arm: a correction bit
    // on an existing coefficient (3 = 2+1), a NEW coefficient behind
    // it (zigzag 2), a ZRL over 16 zero-history positions crossing a
    // nonzero-history one (−2, bit 0), a second new coefficient
    // (zigzag 25), and an EOB-run tail with a passed-over
    // coefficient. Identical rasters = the refinement arithmetic is
    // the baseline's.
    final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var cur = 0
      private var n = 0
      def bit(v: Int): Unit = {
        cur = (cur << 1) | (v & 1); n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; n = 0
        }
      }
      def bits(v: Int, w: Int): Unit =
        (w - 1 to 0 by -1).foreach(i => bit((v >> i) & 1))
      def done(): Array[Byte] = { while (n != 0) bit(1); out.toByteArray }
    }
    // DC table: 8 codes of 3 bits → categories 0..7 (code = cat);
    // AC table: 7 codes of 3 bits → symbols 00,01,02,22,31,51,F0
    val acSyms = Seq(0x00, 0x01, 0x02, 0x22, 0x31, 0x51, 0xf0)
    def hdr(sof: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def bs(xs: Int*): Unit = xs.foreach(x => o.write(x & 0xff))
      bs(0xff, 0xd8)
      bs(0xff, 0xdb, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => o.write(8))
      bs(0xff, 0xc4, 0x00, 0x1b, 0x00, 0, 0, 8)
      (0 until 13).foreach(_ => o.write(0)); (0 to 7).foreach(o.write)
      bs(0xff, 0xc4, 0x00, 0x1a, 0x10, 0, 0, 7)
      (0 until 13).foreach(_ => o.write(0)); acSyms.foreach(o.write)
      bs(0xff, sof, 0x00, 0x0b, 8, 0, 8, 0, 8, 1, 1, 0x11, 0)
      o.toByteArray
    }
    def sos(ss: Int, se: Int, ahal: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff, 0xda, 0x00, 0x08, 1, 1, 0x00, ss, se, ahal).map(_.toByte) ++ data
    // emit an AC symbol's 3-bit code (code = table index)
    def ac(w: BitWriter, sym: Int): Unit = w.bits(acSyms.indexOf(sym), 3)

    // baseline: cat4 '100' + '1010' (=10); (0,2)+'11' (3);
    // (0,1)+'1' (1); (2,2)+'01' (−2); ZRL; (3,1)+'1' (zigzag 25); EOB
    val wb = new BitWriter
    wb.bits(4, 3); wb.bits(10, 4)
    ac(wb, 0x02); wb.bits(3, 2)
    ac(wb, 0x01); wb.bits(1, 1)
    ac(wb, 0x22); wb.bits(1, 2)
    ac(wb, 0xf0)
    ac(wb, 0x31); wb.bits(1, 1)
    ac(wb, 0x00)
    val baseline = hdr(0xc0) ++ sos(0, 63, 0x00, wb.done()) ++
      Array(0xff.toByte, 0xd9.toByte)

    // SA scan 1 — DC first, Al=1: diff 10>>1 = 5, cat 3 + '101'
    val s1 = new BitWriter
    s1.bits(3, 3); s1.bits(5, 3)
    // SA scan 2 — DC refinement: one raw bit (10 & 1 = 0)
    val s2 = new BitWriter
    s2.bit(0)
    // SA scan 3 — AC first, Al=1 (values >>1): zigzag 1→1, 5→−1:
    // (0,1)+'1'; (3,1)+'0'; EOB
    val s3 = new BitWriter
    ac(s3, 0x01); s3.bit(1)
    ac(s3, 0x31); s3.bit(0)
    ac(s3, 0x00)
    // SA scan 4 — AC refinement, Ah=1: (0,1)+sign1 → correction bit
    // for zigzag 1 (its low bit, 1), new +1 lands at zigzag 2; then
    // ZRL skipping 16 zero-history positions (correction bit 0 for
    // zigzag 5 passed over); (5,1)+sign1 → new +1 at zigzag 25; EOB
    // (no nonzero-history positions remain past it)
    val s4 = new BitWriter
    ac(s4, 0x01); s4.bit(1); s4.bit(1)
    ac(s4, 0xf0); s4.bit(0)
    ac(s4, 0x51); s4.bit(1)
    ac(s4, 0x00)
    val sa = hdr(0xc2) ++
      sos(0, 0, 0x01, s1.done()) ++ sos(0, 0, 0x10, s2.done()) ++
      sos(1, 63, 0x01, s3.done()) ++ sos(1, 63, 0x10, s4.done()) ++
      Array(0xff.toByte, 0xd9.toByte)

    val Some((_, _, 1, pxB)) = RealDecoders.jpegRaster(baseline)
    val Some((_, _, 1, pxS)) = RealDecoders.jpegRaster(sa)
    assert(java.util.Arrays.equals(pxS, pxB),
      "SA refinement must reconstruct the baseline raster bit-for-bit")
    // and the coefficients genuinely moved: the DC-only coarse decode
    // differs from the full one
    assert(!pxB.forall(_ == pxB(0)))
  }

  test("jpegRaster still decodes the 1-component (grayscale) profile") {
    import Multimodal.{MediaFixtures, RealDecoders}
    for (id <- Seq(3L, 111L)) {
      val b = MediaFixtures.jpegGray(id)
      val (w, h) = ((1 + id % 61).toInt, (1 + id % 37).toInt)
      val Some((dw, dh, ch, px)) = RealDecoders.jpegRaster(b)
      assert(dw == w && dh == h && ch == 1)
      assert(px.length == w * h)
      val bw = (w + 7) / 8
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y / 8) * bw + (x / 8)
        val m = ((id * 7 + k * 13) % 64).toInt
        val want = if ((id + k) % 2 == 0) 192 + m else 64 - m
        assert((px(y * w + x) & 0xff) == want, s"id=$id y=$y x=$x")
      }
    }
  }

  test("corrupted JPEG scan: raster decode refuses, header probe still answers") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders}
    val id = 9L // baseline 4:4:4 (eff % 3 = 0), multi-block (10×10)
    val good = MediaFixtures.jpeg(id)
    assert(RealDecoders.jpegRaster(good).isDefined)
    def flip(b: Array[Byte], at: Int, to: Int): Array[Byte] = {
      val c = b.clone(); c(at) = to.toByte; c
    }
    // scan starts after SOI(2)+APP0(18)+DQT(69)+DHT(22)+DHT(22)+
    // DRI(6)+SOF0(19)+SOS(14) = 172; an MCU is 6 bytes (Y 00 Cb 00 Cr
    // 00), first RST at scanAt+6
    val scanAt = 172
    assert((good(scanAt + 1) & 0xff) == 0x00, "layout drifted: EOB expected")
    assert((good(scanAt + 6) & 0xff) == 0xff &&
      (good(scanAt + 7) & 0xff) == 0xd0, "layout drifted: RST0 expected")
    val corrupted = Seq(
      // a bare 0xFF mid-scan is a marker where a codeword must be
      flip(good, scanAt, 0xff),
      // …also when it lands on a CHROMA component's codeword
      flip(good, scanAt + 2, 0xff),
      // a wrong restart marker value breaks the interval contract
      flip(good, scanAt + 7, 0xd7),
      // a non-baseline frame type is outside the decode profile
      flip(good, 140, 0xc2), // the SOF0 marker byte (SOF segment at 139)
      // a subsampled chroma component (Cb sampling 0x22) is outside
      // the 4:4:4 profile
      flip(good, 153, 0x22),
      // an SOS claiming 2 of the 3 frame components mismatches
      flip(good, 162, 2),
      // truncation mid-scan
      good.take(good.length - 6),
      // truncation mid-MCU: Y and Cb decoded, Cr missing
      good.take(scanAt + 4))
    corrupted.foreach { bad =>
      assert(RealDecoders.jpegRaster(bad).isEmpty, "corrupt scan must refuse")
      assert(RealDecoders.sampledFrames(MediaRecord(id, bad)).isEmpty)
    }
    // …while the header probe still reads dims from the intact SOF
    assert(RealDecoders.jpegHeader(corrupted.head)
      .contains((1L + id % 61, 1L + id % 37)))
    // a corrupted DC byte (still a VALID scan) changes the q61 fp —
    // the fingerprint is content-derived pixels, not blob bytes
    val altered = flip(good, scanAt, (good(scanAt) ^ 0x15) & 0x7f)
    val fp0 = Multimodal.hexMd5(
      RealDecoders.sampledFrames(MediaRecord(id, good)).next()._3)
    val fp1 = Multimodal.hexMd5(
      RealDecoders.sampledFrames(MediaRecord(id, altered)).next()._3)
    assert(fp0 != fp1)
  }

  test("pngHeader rejects corrupted headers — wrong magic, bad IHDR, hostile dims") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders}
    val good = MediaFixtures.png(2L)
    assert(RealDecoders.pngHeader(good).contains((1L + 2 % 53, 1L + 2 % 29)))
    // truncated signature
    assert(RealDecoders.pngHeader(good.take(7)).isEmpty)
    // flipped signature byte
    val badSig = good.clone(); badSig(1) = 'Q'.toByte
    assert(RealDecoders.pngHeader(badSig).isEmpty)
    // first chunk not IHDR
    val notIhdr = good.clone(); notIhdr(13) = 'X'.toByte
    assert(RealDecoders.pngHeader(notIhdr).isEmpty)
    // zero width (bytes 16..19 big-endian)
    val zeroW = good.clone(); for (i <- 16 to 19) zeroW(i) = 0
    assert(RealDecoders.pngHeader(zeroW).isEmpty)
    // illegal colour type (3 bit-depth-1 combos are legal; 7 is not)
    val badColour = good.clone(); badColour(25) = 7
    assert(RealDecoders.pngHeader(badColour).isEmpty)
    // hostile dimensions past the 2^20 sanity bound
    val hugeW = good.clone(); hugeW(16) = 0x7f.toByte
    assert(RealDecoders.pngHeader(hugeW).isEmpty)
    // every rejection degrades to the honest opaque record
    for ((b, id) <- Seq(badSig -> 1L, notIhdr -> 2L, badColour -> 3L)) {
      val rec = MediaRecord(id, b)
      assert(RealDecoders.decode(rec) == RealDecoders.opaque(rec))
    }
  }

  test("jpegHeader rejects corrupted headers — no SOF, lying lengths, truncation") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders}
    val good = MediaFixtures.jpeg(3L)
    assert(RealDecoders.jpegHeader(good).contains((1L + 3 % 61, 1L + 3 % 37)))
    // SOI alone: no SOF before the walk ends
    assert(RealDecoders.jpegHeader(Array(0xff, 0xd8).map(_.toByte)).isEmpty)
    // SOI + EOI: explicit end marker before any SOF
    assert(RealDecoders.jpegHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // a segment length pointing past the blob must not be walked
    val lying = good.clone()
    lying(4) = 0x7f.toByte  // APP0 length high byte → 0x7f10 ≫ blob
    assert(RealDecoders.jpegHeader(lying).isEmpty)
    // truncated mid-SOF: the dims sit past the end
    assert(RealDecoders.jpegHeader(good.take(25)).isEmpty)
    // marker byte that isn't 0xFF stops the walk (corrupt stream)
    val derail = good.clone(); derail(2) = 0x00
    assert(RealDecoders.jpegHeader(derail).isEmpty)
    for ((b, id) <- Seq(lying -> 1L, derail -> 2L)) {
      val rec = MediaRecord(id, b)
      assert(RealDecoders.decode(rec) == RealDecoders.opaque(rec))
    }
  }

  test("q61 frame fingerprints are CONTENT-derived: a corrupted payload byte changes the fp") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders, hexMd5}
    // WAV: corrupt one byte inside frame 2's PCM block — only that
    // frame's fingerprint may change
    val id = 7L  // odd → WAV; ba = (1 + 7%3)*2 = 4, frames = 10 + 7 = 17
    val clean = MediaFixtures.wav(id)
    val (_, _, ba, dataOff, _) = RealDecoders.wavHeader(clean).get
    val corrupt = clean.clone()
    val victim = dataOff + (2 * ba).toInt + 1  // inside frame 2
    corrupt(victim) = (corrupt(victim) ^ 0x5a).toByte
    val fps = RealDecoders.sampledFrames(MediaRecord(id, clean))
      .map { case (_, fi, bytes) => fi -> hexMd5(bytes) }.toMap
    val fpsC = RealDecoders.sampledFrames(MediaRecord(id, corrupt))
      .map { case (_, fi, bytes) => fi -> hexMd5(bytes) }.toMap
    assert(fps.keySet == fpsC.keySet)
    assert(fps(2L) != fpsC(2L), "corrupted frame kept its fingerprint")
    (fps.keySet - 2L).foreach(fi =>
      assert(fps(fi) == fpsC(fi), s"untouched frame $fi changed"))

    // PPM: the single frame is the raster — corrupt a pixel byte
    val pid = 8L
    val pClean = MediaFixtures.ppm(pid)
    val Some((_, _, _, off)) = RealDecoders.ppmHeader(pClean)
    val pCorrupt = pClean.clone()
    pCorrupt(off + 5) = (pCorrupt(off + 5) ^ 0x5a).toByte
    def fpOf(b: Array[Byte]) =
      RealDecoders.sampledFrames(MediaRecord(pid, b)).next()._3
    assert(hexMd5(fpOf(pClean)) != hexMd5(fpOf(pCorrupt)))
  }

  test("pngRaster decodes the fixture: real inflation, defilter, formula bytes") {
    import Multimodal.{MediaFixtures, RealDecoders}
    for (id <- Seq(2L, 6L, 106L)) {
      val b = MediaFixtures.png(id)
      val (w, h) = ((1 + id % 53).toInt, (1 + id % 29).toInt)
      val Some((dw, dh, px)) = RealDecoders.pngRaster(b)
      assert(dw == w && dh == h)
      assert(px.length == w * h * 3)
      // de-filtered pixels must equal the fixture formula at the
      // non-filter stream positions
      val stride = 1 + 3 * w
      for (y <- 0 until h; x <- 0 until 3 * w) {
        val k = y * stride + 1 + x
        assert((px(y * 3 * w + x) & 0xff) == ((id * 11 + k.toLong * 17) % 256).toInt,
          s"id=$id y=$y x=$x")
      }
    }
  }

  test("corrupted IDAT: raster decode refuses, header probe still answers") {
    import Multimodal.{MediaFixtures, MediaRecord, RealDecoders}
    val good = MediaFixtures.png(10L)
    def flip(b: Array[Byte], at: Int): Array[Byte] = {
      val c = b.clone(); c(at) = (c(at) ^ 0x5a).toByte; c
    }
    // IDAT chunk data starts after 8 (sig) + 25 (IHDR chunk) + 8
    // (IDAT len+type) = 41; flip bytes inside the zlib payload, the
    // stored-block LEN field, and the Adler tail
    val zlibStart = 41
    val corrupted = Seq(
      flip(good, zlibStart),          // zlib header
      flip(good, zlibStart + 3),      // stored-block LEN
      flip(good, zlibStart + 10),     // payload byte (breaks Adler)
      // Adler-32 tail: last 4 zlib bytes, sitting before the IDAT CRC
      // (4) and IEND (12) at the blob's end
      flip(good, good.length - 17),
      good.take(zlibStart + 20))      // truncated mid-IDAT (no IEND)
    corrupted.foreach { b =>
      assert(RealDecoders.pngRaster(b).isEmpty, "corrupt stream must not decode")
      assert(RealDecoders.sampledFrames(MediaRecord(10L, b)).isEmpty,
        "corrupt stream must emit no frames")
    }
    // header-only probing still works on in-chunk corruption (not the
    // truncated blob, whose IHDR is intact too)
    corrupted.take(4).foreach { b =>
      assert(RealDecoders.decodePng(MediaRecord(10L, b)).nonEmpty,
        "header probe must still answer on payload corruption")
    }
    // and a payload byte flip CHANGES the q61 story vs the original:
    // the original decodes one frame
    assert(RealDecoders.sampledFrames(MediaRecord(10L, good)).size == 1)
  }

  test("defilter reverses all five PNG filter types") {
    import Multimodal.RealDecoders
    // reference image 3x3 RGB, bytes 0..26 scaled to exercise wrap
    val w = 3; val h = 3; val bpp = 3; val stride = w * bpp
    val img = Array.tabulate(h * stride)(i => ((i * 37 + 11) % 256).toByte)
    def px(y: Int, x: Int): Int =
      if (y < 0 || x < 0) 0 else img(y * stride + x) & 0xff
    def paethRef(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // encode each scanline with filter type = its row index (0,1,2)
    // then re-encode the whole image per filter type for 3 and 4
    def encode(filterOf: Int => Int): Array[Byte] = {
      val out = new Array[Byte](h * (1 + stride))
      for (y <- 0 until h) {
        val ft = filterOf(y)
        out(y * (1 + stride)) = ft.toByte
        for (x <- 0 until stride) {
          val raw = px(y, x)
          val left = if (x >= bpp) px(y, x - bpp) else 0
          val up = px(y - 1, x)
          val ul = if (x >= bpp) px(y - 1, x - bpp) else 0
          val f = ft match {
            case 0 => raw
            case 1 => raw - left
            case 2 => raw - up
            case 3 => raw - (left + up) / 2
            case 4 => raw - paethRef(left, up, ul)
          }
          out(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
        }
      }
      out
    }
    for (ft <- 0 to 4) {
      val dec = RealDecoders.defilter(encode(_ => ft), w, h, bpp)
        .getOrElse(fail(s"filter $ft rejected"))
      assert(dec.toSeq == img.toSeq, s"filter $ft round-trip")
    }
    // mixed filters per scanline
    val mixed = RealDecoders.defilter(encode(y => y + 1), w, h, bpp)
      .getOrElse(fail("mixed filters rejected"))
    assert(mixed.toSeq == img.toSeq)
    // undefined filter type and size mismatch refuse
    val bad = encode(_ => 0); bad(0) = 5.toByte
    assert(RealDecoders.defilter(bad, w, h, bpp).isEmpty)
    assert(RealDecoders.defilter(bad.drop(1), w, h, bpp).isEmpty)
  }

  test("inflate handles REAL compressed streams, not just stored blocks") {
    import Multimodal.RealDecoders
    val data = Array.tabulate(5000)(i => ((i * i * 31 + i) % 251).toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](10000)
    val n = d.deflate(buf); d.end()
    val z = buf.take(n)
    assert(RealDecoders.inflate(z, data.length).map(_.toSeq).contains(data.toSeq))
    // wrong expected size, a corrupt Adler tail, and truncation refuse
    // (a mid-stream bit flip may land on an unused Huffman-table entry
    // and change nothing — the checksum tail and the length ARE the
    // deterministic integrity signals)
    assert(RealDecoders.inflate(z, data.length - 1).isEmpty)
    assert(RealDecoders.inflate(z, data.length + 1).isEmpty)
    val zc = z.clone(); zc(z.length - 1) = (zc(z.length - 1) ^ 0x7f).toByte
    assert(RealDecoders.inflate(zc, data.length).isEmpty)
    assert(RealDecoders.inflate(z.take(z.length - 6), data.length).isEmpty)
  }

  test("resizeNearest picks the exact NN source pixels (handcrafted 4x2 -> 2x1)") {
    import Multimodal.{MediaRecord, RealDecoders}
    // 4x2 image, bytes 0..23; out 2x1: oy=0→sy=0; ox=0→sx=0, ox=1→sx=2
    val header = "P6\n4 2\n255\n".getBytes("US-ASCII")
    val raster = Array.tabulate(24)(_.toByte)
    val b = header ++ raster
    val Some((w, h, bps, off)) = RealDecoders.ppmHeader(b)
    val out = RealDecoders.resizeNearest(b, w, h, bps, off, 2, 1)
    // pixel (0,0) = bytes 0,1,2; pixel (0,2) = bytes 6,7,8
    assert(out.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
  }
}
