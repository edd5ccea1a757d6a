package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the token-shingle window kernels to the readable formulations they
  * replaced:
  *
  *   - shingleBandMinsOf(text, k, L, B) ≡ minhashBandMins(tokenShingles(tokensOf(text), k), L, B)
  *   - shingleHashedSetOf(text, k)      ≡ hashedSet(tokenShingles(tokensOf(text), k))
  *
  * The kernels encode the lowercased token stream into ONE byte buffer
  * with single-space separators and hash shingles as contiguous byte
  * windows (a k-shingle's joined string IS such a window), so the
  * equalities must hold bit-for-bit on every shape the encoding could
  * break: separator runs (multiple non-alnum chars collapse to one token
  * break, never an empty token), leading/trailing separators, uppercase,
  * digits, fewer-than-k and zero tokens (the single mkString shingle),
  * duplicate shingles, and non-ASCII inputs (the String fallback path).
  */
class ShingleKernelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val asciiGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '-', '_', '.', ',', '/', '(', ')'),
    1 -> Gen.oneOf('A', 'Z', '0', '9'),
    1 -> Gen.oneOf('x', 'y'))).map(_.mkString)
  private val uniGen: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '-'),
    2 -> Gen.oneOf('\u00e9', '\u00dc', '\u0130', '\u4e2d'),
    1 -> Gen.choose(0xD800.toChar, 0xDFFF.toChar))).map(_.mkString)
  private val textGen: Gen[String] =
    Gen.frequency(7 -> asciiGen, 2 -> uniGen, 1 -> Gen.const(""))
  private val kGen: Gen[Int] = Gen.oneOf(1, 2, 3, 5)

  test("shingleBandMinsOf ≡ minhashBandMins ∘ tokenShingles ∘ tokensOf (property)") {
    check(Prop.forAll(textGen, kGen) { (text, k) =>
      val expect = Dedup.minhashBandMins(
        Dedup.tokenShingles(Dedup.tokensOf(text), k), 16, 4)
      val got = Dedup.shingleBandMinsOf(text, k, 16, 4)
      expect.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq
    })
  }

  test("shingleHashedSetOf ≡ hashedSet ∘ tokenShingles ∘ tokensOf (property)") {
    check(Prop.forAll(textGen, kGen) { (text, k) =>
      Dedup.hashedSet(Dedup.tokenShingles(Dedup.tokensOf(text), k)).toSeq ==
        Dedup.shingleHashedSetOf(text, k).toSeq
    })
  }

  test("edge pins: empty, separators-only, <k tokens, repeats, null") {
    for (t <- Seq("", "  --  ", "one", "one two", "a b a b a b", "A-B_c.9",
                  "  lead", "trail  ");
         k <- Seq(1, 3, 7)) {
      assert(Dedup.shingleHashedSetOf(t, k).toSeq ==
        Dedup.hashedSet(Dedup.tokenShingles(Dedup.tokensOf(t), k)).toSeq,
        s"hashedSet t='$t' k=$k")
      assert(Dedup.shingleBandMinsOf(t, k, 8, 4).map(_.toSeq).toSeq ==
        Dedup.minhashBandMins(Dedup.tokenShingles(Dedup.tokensOf(t), k), 8, 4)
          .map(_.toSeq).toSeq, s"bandMins t='$t' k=$k")
    }
    assert(Dedup.shingleHashedSetOf(null, 3).toSeq ==
      Dedup.hashedSet(Dedup.tokenShingles(Dedup.tokensOf(null), 3)).toSeq)
  }
}
