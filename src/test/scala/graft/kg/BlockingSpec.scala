package graft.kg

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** J10 MinHash-LSH long-tail blocking: near-miss names are found, unrelated
  * names are not, and the Spark path agrees with the scalar band functions.
  */
class BlockingSpec extends AnyFunSuite with SparkTestBase {

  test("identical names share all band keys; near-miss shares at least one") {
    val a = Blocking.bandKeys("ada lovelace")
    val b = Blocking.bandKeys("ada lovelace")
    assert(a.toSeq == b.toSeq && a.length == Blocking.Bands)
    val near = Blocking.bandKeys("ada lxvelace")
    assert(a.intersect(near).nonEmpty, "near-miss should collide in ≥1 band")
    val far = Blocking.bandKeys("quantum tensor labs")
    assert(a.intersect(far).isEmpty)
  }

  test("jaccardShingles: identical=1, near-miss high, unrelated low") {
    assert(Blocking.jaccardShingles("ada lovelace", "ada lovelace") == 1.0)
    assert(Blocking.jaccardShingles("ada lovelace", "ada lxvelace") >= 0.5)
    assert(Blocking.jaccardShingles("ada lovelace", "quantum tensor") < 0.2)
  }

  test("fuzzyNameMatches finds the near-miss dictionary name via Spark") {
    import spark.implicits._
    val qnames = Seq(("kb:e1", "ada lovelace"), ("kb:e2", "grace hopper"))
      .toDF("entity_id", "qname")
    val dictNames = Seq("ada lxvelace", "unrelated person", "grace hoppxr")
      .toDF("name")
    val got = Blocking.fuzzyNameMatches(qnames, dictNames, 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("kb:e1", "ada lxvelace"), ("kb:e2", "grace hoppxr")))
  }

  test("pipeline end-to-end: zero-exact-candidate entity gains fuzzy candidates") {
    // build a miniature world directly: dictionary has only a near-miss name
    import spark.implicits._
    val dict = Seq(("ada lxvelace", 100L, 5L)).toDF("name", "account_id", "freq")
    val entities = Seq(Entity("kb:e1", Seq("Ada Lovelace"), Seq("Ada Lovelace"),
      "per", dead = false, "x")).toDF()
    val cands = CandidateGen.candidates(spark, entities, dict)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cands == Set(("kb:e1", 100L, 5L)))
  }
}
