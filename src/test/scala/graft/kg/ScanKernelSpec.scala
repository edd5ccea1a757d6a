package graft.kg

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-pass marker kernel (Scan.MarkerRe) to the historical
  * three-regex formulation it replaced: annotation rows from
  * `// @(author|mention) (\S+) \(([^)]*)\)`, author/mention screens from
  * `// @author (\S+)` / `// @mention (\S+)` — three independent scans of
  * every content string.
  *
  * Equivalence condition (documented at Scan.MarkerRe): the combined pass
  * produces the SAME three match sets whenever no marker match OVERLAPS
  * text that another independent scan would match — concretely, (a) display
  * names contain no `// @` marker, (b) screen tokens are \w+ (never "//"),
  * and (c) a ` (` after a screen is closed before any later marker (the
  * display group `[^)]*` spans newlines in BOTH formulations, so an
  * unclosed paren closed lines later swallows inner markers only in the
  * single pass). All three hold for every generator, fixture, and the
  * reference's data model; the DuckDB oracle replays re-derive the
  * products independently, so a corpus that broke the condition would
  * fail the correctness gate, not silently drift. The divergence pins
  * below keep each sub-condition visible.
  */
class ScanKernelSpec extends AnyFunSuite {

  private val AnnotationRe = "// @(author|mention) (\\S+) \\(([^)]*)\\)".r
  private val AuthorRe = "// @author (\\S+)".r
  private val MentionRe = "// @mention (\\S+)".r

  private def reference(content: String)
      : (Seq[(String, String, String)], Seq[String], Seq[String]) = (
    AnnotationRe.findAllMatchIn(content)
      .map(m => (m.group(1), m.group(2), m.group(3))).toSeq,
    AuthorRe.findAllMatchIn(content).map(_.group(1)).toSeq,
    MentionRe.findAllMatchIn(content).map(_.group(1)).toSeq)

  private def combined(content: String)
      : (Seq[(String, String, String)], Seq[String], Seq[String]) = {
    val p = Scan.productsOf(content)
    (p.anns, p.authors, p.mens)
  }

  private val screenGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
  private val displayGen: Gen[String] = Gen.listOf(
    Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
    .map(_.mkString.take(24))
  // in-condition content: well-formed display markers, no-display markers,
  // and junk without '@' (junk with '@' can assemble overlapping marker
  // fragments — pinned as divergences below, impossible in real content)
  private val lineGen: Gen[String] = Gen.frequency(
    3 -> (for { k <- Gen.oneOf("author", "mention"); s <- screenGen;
                d <- displayGen } yield s"// @$k $s ($d)"),
    2 -> (for { k <- Gen.oneOf("author", "mention"); s <- screenGen }
            yield s"// @$k $s"),
    4 -> Gen.listOf(Gen.frequency(9 -> Gen.alphaNumChar,
           1 -> Gen.oneOf(' ', '(', ')', '/'))).map(_.mkString.take(40)))
  private val contentGen: Gen[String] =
    Gen.listOf(lineGen).map(_.mkString("\n"))

  test("single-pass kernel ≡ three-regex formulation on in-condition content") {
    // forAllNoShrink: scalacheck shrinking mutates strings OUTSIDE the
    // generator's domain (e.g. hollowing a screen down to "//"), which
    // "finds" the already-pinned divergences instead of real failures
    val prop = Prop.forAllNoShrink(contentGen) { content =>
      combined(content) == reference(content)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("fixed fixtures: optional display, trailing unclosed paren, no-space paren") {
    val cases = Seq(
      "// @author bob (Bob B)\n// @mention alice (Alice)\ncode line",
      "// @author bob\n// @mention alice",
      "// @author bob (unclosed, never closed\n// @mention alice",
      "// @author bob(Bob)\nx", // no space before paren: screen = bob(Bob)
      "",
      "no markers at all ( ) @")
    cases.foreach(c => assert(combined(c) === reference(c), s"case: $c"))
  }

  // --- the hand-rolled scanner vs the regex it replaced (FULL equivalence:
  // scanMarkers mirrors MarkerRe itself, so unlike the three-regex
  // comparison above it must agree on ARBITRARY content, junk included) ---

  private def viaRegex(content: String): Seq[(Boolean, String, String)] =
    Scan.MarkerRe.findAllMatchIn(content)
      .map(m => (m.group(1) == "author", m.group(2), m.group(4))).toSeq

  private def viaScanner(content: String): Seq[(Boolean, String, String)] = {
    val b = Seq.newBuilder[(Boolean, String, String)]
    Scan.scanMarkers(content)((a, s, d) => b += ((a, s, d)))
    b.result()
  }

  private val hostileGen: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '(', ')', '/', '@', '\n', '\t'),
    1 -> Gen.oneOf("// @", "// @author ", "// @mention ", "// @authorx",
      "// @mentions", "(", ")", " (", "// @author  two", "// @author\t"),
    1 -> Gen.const("// @author a (// @mention b)")))
    .map(_.mkString)

  test("scanMarkers ≡ MarkerRe.findAllMatchIn on arbitrary hostile content") {
    val prop = Prop.forAllNoShrink(hostileGen) { content =>
      viaScanner(content) == viaRegex(content)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("scanMarkers fixtures: every regex edge the scanner mirrors by hand") {
    val cases = Seq(
      "// @author bob (Bob B) tail", // display present
      "// @author bob", // bare screen at EOF
      "// @author bob (never closed", // optional group fails: no ')'
      "// @author bob(Bob)", // paren glued to screen: part of \\S+
      "// @author  two", // double space: \\S+ fails, no match
      "// @authorx y", // kind not followed by space
      "// @mention m (a\nmultiline\ndisplay) x", // [^)]* spans newlines
      "// @author a (// @mention b) // @mention c", // marker inside display consumed
      "// @// @author x", // failed start, real match later
      "// @author // @author y", // screen \"//\" re-forms a prefix
      "// @author \t", // screen would be empty
      "// @mention m (x) (y)", // only the first paren group binds
      "")
    cases.foreach(c => assert(viaScanner(c) === viaRegex(c), s"case: $c"))
  }

  // --- the fused tokenizer+hasher vs the String-allocating formulation ---

  private def hashesViaStrings(content: String): Seq[(Long, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    Text.tokens(content).foreach { t =>
      val h = graft.ops.Dedup.xxLane(0, t)
      m.update(h, m.getOrElse(h, 0L) + 1L)
    }
    m.toSeq
  }

  private val tokenContentGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\n', '.', '_', '-', '(', ')'),
    1 -> Gen.oneOf('é', 'Ø', 'ß', 'Ω', 'λ', 'Щ', '中', '7', 'Ⅻ'),
    1 -> Gen.oneOf('\uD83D', '\uDE00', ' '))) // lone surrogates + nbsp
    .map(_.mkString)

  test("tokenHashCounts ≡ Text.tokens + xxLane bit-exactly, non-ASCII included") {
    val prop = Prop.forAllNoShrink(tokenContentGen) { content =>
      Scan.tokenHashCounts(content) == hashesViaStrings(content)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenHashCounts fixtures: long tokens grow the buffer; order and counts") {
    val cases = Seq(
      "a" * 500 + " " + "b" * 1000 + " a b a", // buffer growth + counts
      "中文 tokens mixed with ascii 中文",
      "CamelCase UPPER lower 123abc",
      "", "   ", "\n\t")
    cases.foreach(c =>
      assert(Scan.tokenHashCounts(c) === hashesViaStrings(c), s"case: $c"))
  }

  test("divergence pin (a): a display name containing a marker is consumed") {
    // A marker INSIDE a display name is swallowed by the enclosing
    // annotation's display group in the single pass; the independent
    // author scan would also find the inner marker.
    val c = "// @author a (// @author b c)"
    val (_, refAuthors, _) = reference(c)
    val (_, combAuthors, _) = combined(c)
    assert(refAuthors === Seq("a", "b"))
    assert(combAuthors === Seq("a"))
  }

  test("divergence pin (b): a screen token that re-forms a marker prefix") {
    // A screen of literally "//" makes the independent scans see a SECOND
    // marker starting inside the first match ("// @mention //" + " @author
    // x" rescans as "// @author x"); the single pass resumes after the
    // consumed match.
    val c = "// @mention // @author x"
    val (_, refAuthors, refMens) = reference(c)
    val (_, combAuthors, combMens) = combined(c)
    assert(refMens === Seq("//") && refAuthors === Seq("x"))
    assert(combMens === Seq("//") && combAuthors === Seq.empty)
  }

  test("divergence pin (c): an unclosed paren closed on a later line") {
    // `[^)]*` spans newlines in both formulations, so ` (unclosed` followed
    // by a later `)` forms one annotation whose display swallows the inner
    // marker in the single pass; the independent mention scan still finds
    // it. Generators always close a display on its own line.
    val c = "// @author Xv (unclosed\n// @mention Vif (9q)"
    val (refAnns, _, refMens) = reference(c)
    val (combAnns, _, combMens) = combined(c)
    assert(refAnns === combAnns) // same annotation either way
    assert(refAnns.head._3 === "unclosed\n// @mention Vif (9q")
    assert(refMens === Seq("Vif"))
    assert(combMens === Seq.empty)
  }
}
