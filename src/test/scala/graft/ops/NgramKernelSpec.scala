package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the allocation-free ngram scalar kernels to the readable
  * formulations they replaced:
  *
  *   - ngramBandMinsOf(text, n, L, B)  ≡ minhashBandMins(charGrams(text, n), L, B)
  *   - ngramHashedSetOf(text, n)       ≡ hashedSet(charGrams(text, n))
  *
  * The kernels run FNV-1a / XXH64 over char / byte WINDOWS of the
  * normalized text instead of materializing per-position substring grams
  * through a LinkedHashSet, so the equalities must hold bit-for-bit on
  * every input shape the window tricks could break: whitespace runs
  * (collapse + trim), uppercase (per-char vs String.toLowerCase),
  * non-ASCII (the String fallback path), shorter-than-n and empty texts
  * (the single whole-text gram), and duplicate-gram-heavy texts (the
  * mins-don't-dedupe and hash-then-distinct arguments).
  */
class NgramKernelSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // whitespace-heavy, case-mixed, repetition-heavy ASCII + some unicode
  private val asciiGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
    1 -> Gen.oneOf('A', 'Z', 'Q'),
    1 -> Gen.oneOf("ab".toSeq))).map(_.mkString)
  private val uniGen: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar,
    1 -> Gen.oneOf(' ', '\n'),
    2 -> Gen.oneOf('\u00e9', '\u00dc', '\u00df', '\u03bb', '\u4e2d', '\u00A0'),
    1 -> Gen.choose(0xD800.toChar, 0xDFFF.toChar))).map(_.mkString)
  private val textGen: Gen[String] =
    Gen.frequency(7 -> asciiGen, 2 -> uniGen, 1 -> Gen.const(""))
  private val nGen: Gen[Int] = Gen.oneOf(1, 2, 4, 7)

  test("ngramBandMinsOf ≡ minhashBandMins ∘ charGrams (property)") {
    check(Prop.forAll(textGen, nGen) { (text, n) =>
      val expect = Dedup.minhashBandMins(Dedup.charGrams(text, n), 16, 4)
      val got = Dedup.ngramBandMinsOf(text, n, 16, 4)
      expect.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq
    })
  }

  test("ngramHashedSetOf ≡ hashedSet ∘ charGrams (property)") {
    check(Prop.forAll(textGen, nGen) { (text, n) =>
      val expect = Dedup.hashedSet(Dedup.charGrams(text, n)).toSeq
      val got = Dedup.ngramHashedSetOf(text, n).toSeq
      expect == got
    })
  }

  test("edge pins: empty, all-whitespace, shorter-than-n, null-free normalize") {
    for (t <- Seq("", "   \t\n ", "ab", "AB  cDef ", "aaaaaaa", " x ");
         n <- Seq(1, 4, 9)) {
      assert(Dedup.ngramHashedSetOf(t, n).toSeq ==
        Dedup.hashedSet(Dedup.charGrams(t, n)).toSeq, s"hashedSet t=$t n=$n")
      assert(Dedup.ngramBandMinsOf(t, n, 8, 4).map(_.toSeq).toSeq ==
        Dedup.minhashBandMins(Dedup.charGrams(t, n), 8, 4).map(_.toSeq).toSeq,
        s"bandMins t=$t n=$n")
    }
    // null text: UDFs never see null (Spark skips null inputs for
    // primitive-arg Scala UDFs) but the kernel guards anyway
    assert(Dedup.ngramHashedSetOf(null, 4).toSeq ==
      Dedup.hashedSet(Dedup.charGrams(null, 4)).toSeq)
  }
}
