package graft.config

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {

  test("defaults validate clean") {
    Tuning().validate() // must not throw
  }

  test("every knob rejects non-positive values with its own name") {
    val bad = Seq[(String, Tuning)](
      "dfCap" -> Tuning(dfCap = 0),
      "minhashBands" -> Tuning(minhashBands = 0),
      "minhashRows" -> Tuning(minhashRows = -1),
      "minhashBucketCap" -> Tuning(minhashBucketCap = 0),
      "lshTables" -> Tuning(lshTables = 0),
      "lshBucketCap" -> Tuning(lshBucketCap = -5),
      "nprobe" -> Tuning(nprobe = 0),
      "sourceQuota" -> Tuning(sourceQuota = 0),
      "kmvK" -> Tuning(kmvK = 0),
      "storeMaxSegments" -> Tuning(storeMaxSegments = 0),
      "bloomBits" -> Tuning(bloomBits = 0),
      "outlierK" -> Tuning(outlierK = -1))
    for ((name, t) <- bad) {
      val e = intercept[ConfigurationError](t.validate())
      assert(e.getMessage.contains(name), s"message for $name: ${e.getMessage}")
    }
  }

  test("lloydIters = 0 is legal (seed codebook, no refinement); negative is not") {
    Tuning(lloydIters = 0).validate()
    intercept[ConfigurationError](Tuning(lloydIters = -1).validate())
  }

  test("signature size is capped at 64 (affine-constant overflow bound)") {
    Tuning(minhashBands = 32, minhashRows = 2).validate() // 64: legal
    intercept[ConfigurationError](
      Tuning(minhashBands = 33, minhashRows = 2).validate())
  }

  test("bloomBits capped at Spark's runtime-filter ceiling (2^26)") {
    Tuning(bloomBits = 1 << 26).validate()
    val e = intercept[ConfigurationError](Tuning(bloomBits = (1 << 26) + 1).validate())
    assert(e.getMessage.contains("bloomBits"))
  }

  test("runMinTokens floored at the 8-token window width") {
    Tuning(runMinTokens = 8).validate()
    val e = intercept[ConfigurationError](Tuning(runMinTokens = 7).validate())
    assert(e.getMessage.contains("runMinTokens"))
  }

  test("bandBucketCap: 0 disables, positive tightens, negative rejected") {
    Tuning(bandBucketCap = 0).validate()
    Tuning(bandBucketCap = 5).validate()
    val e = intercept[ConfigurationError](Tuning(bandBucketCap = -1).validate())
    assert(e.getMessage.contains("bandBucketCap"))
  }

  test("lshTables capped at 16") {
    Tuning(lshTables = 16).validate()
    intercept[ConfigurationError](Tuning(lshTables = 17).validate())
  }

  test("the loaded session instance carries the shipped defaults when no overrides are set") {
    // the test JVM sets no graft.tuning.* properties; a GRAFT_TUNING_*
    // env var would legitimately change this, so only assert when absent
    if (!sys.env.keys.exists(_.startsWith("GRAFT_TUNING_")) &&
        !sys.props.keys.exists(_.startsWith("graft.tuning."))) {
      assert(Tuning.current == Tuning())
    }
  }

  test("the production profile validates and flips exactly the documented knobs") {
    val p = Tuning.production
    p.validate()
    assert(p.normalizeNfc == 1 && p.bpeEscape == 1 && p.bpePretok == 1 &&
      p.bpeMinFreq == 2 && p.bpeVocabCap == 100000 && p.bandBucketCap == 3)
    // …and nothing else: undoing the six flips recovers the defaults
    assert(p.copy(normalizeNfc = 0, bpeEscape = 0, bpePretok = 0,
      bpeMinFreq = 1, bpeVocabCap = 0, bandBucketCap = 0) == Tuning())
  }
}
