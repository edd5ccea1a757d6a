package graft.kg

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The three-rung back-off ladder (J11, FillFromIndex.java:99-152 +
  * AllNamesStrategy.java:29-64) on planted frames where every rung fires —
  * the synthesized corpora keep per-entity fan-in under the production
  * threshold at verify scale, so this spec pins the rung semantics
  * directly against hand-computed expectations:
  *
  *   rung 0  all-names rollup ≤ threshold → kept as-is
  *   rung 1  all > threshold, top-3-names rollup ≤ threshold → top-3 rollup
  *   rung 2  both > threshold → primary-name rollup (kept even if still
  *           over threshold — the ladder has no further rung)
  *   empty   rung tightened to a set matching NOTHING → ladder stops empty
  *           (the reference's `while result > 300` loop does not retry on
  *           an empty result)
  */
class BackoffLadderSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ent(id: String, names: Seq[String]): Entity =
    Entity(id, names, Seq.empty, "per", dead = false, "", "")

  // dictionary: "aa aa"→{1..4}, "bb bb"→{5(f2),6(f1)}, "cc cc"→{7(f5)},
  // "dd dd"→{8..12}, "ee ee"→{13..22}
  private val dict = (
    (1 to 4).map(a => ("aa aa", a.toLong, 1L)) ++
    Seq(("bb bb", 5L, 2L), ("bb bb", 6L, 1L), ("cc cc", 7L, 5L)) ++
    (8 to 12).map(a => ("dd dd", a.toLong, 1L)) ++
    (13 to 22).map(a => ("ee ee", a.toLong, 1L))
  ).toDF("name", "account_id", "freq")

  private val conf = KgConf(backoffThreshold = 8, fuzzyEnabled = false)

  private def rollup(entities: Seq[Entity]): Map[(String, Long), Long] =
    CandidateGen.rollupAll(spark, entities.toDF(), dict, conf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("rung 0: under-threshold entities keep the all-names rollup") {
    val got = rollup(Seq(ent("e0", Seq("cc cc"))))
    assert(got == Map(("e0", 7L) -> 5L))
  }

  test("rung 1: overmatched entity narrows to its top-3 names by multiplicity") {
    // all names: {aa,bb,cc,dd} → 12 accounts > 8; multiplicities
    // aa×2 bb×2 cc×2 dd×1 → top3 = aa,bb,cc (count desc, name asc) →
    // 7 accounts ≤ 8 → rung-1 rollup
    val e = ent("e1", Seq("aa aa", "aa aa", "bb bb", "bb bb", "cc cc", "cc cc", "dd dd"))
    val got = rollup(Seq(e))
    val want = ((1 to 4).map(a => ("e1", a.toLong) -> 1L) ++
      Seq(("e1", 5L) -> 2L, ("e1", 6L) -> 1L, ("e1", 7L) -> 5L)).toMap
    assert(got == want)
  }

  test("rung 2: still overmatched after top-3 → primary name, kept even if large") {
    // all: {ee,aa,dd,cc} → 20 > 8; top3 = aa(2), ee(2), cc(1) → 15 > 8 →
    // primary = names.head = "ee ee" → 10 accounts (> 8, but final rung)
    val e = ent("e2", Seq("ee ee", "ee ee", "aa aa", "aa aa", "dd dd", "cc cc"))
    val got = rollup(Seq(e))
    assert(got == (13 to 22).map(a => ("e2", a.toLong) -> 1L).toMap)
  }

  test("a rung that matches nothing stops the ladder empty") {
    // all-names matches only "ee ee" → 10 > 8; top3 = the three ×2 fake
    // names → rollup empty → ladder stops; entity has no exact candidates
    val e = ent("e3", Seq("zz zz", "zz zz", "yy yy", "yy yy", "xx xx", "xx xx", "ee ee"))
    assert(rollup(Seq(e)).isEmpty)
  }

  test("rungs are selected independently per entity in one pass") {
    val es = Seq(
      ent("e0", Seq("cc cc")),
      ent("e1", Seq("aa aa", "aa aa", "bb bb", "bb bb", "cc cc", "cc cc", "dd dd")),
      ent("e2", Seq("ee ee", "ee ee", "aa aa", "aa aa", "dd dd", "cc cc")))
    val got = rollup(es)
    assert(got.keys.count(_._1 == "e0") == 1)
    assert(got.keys.count(_._1 == "e1") == 7)
    assert(got.keys.count(_._1 == "e2") == 10)
    assert(got(("e1", 5L)) == 2L && got(("e2", 13L)) == 1L)
  }

  test("the fuzzy long tail still fires for ladder-stopped entities") {
    // e3's ladder stops empty; with fuzzy enabled its near-miss name
    // ("ee e" ≈ "ee ee" at shingle-Jaccard ≥ 0.5) recovers candidates
    val e = ent("e4", Seq("ee e", "ee e"))
    val got = CandidateGen.rollupAll(spark, Seq(e).toDF(), dict,
        conf.copy(fuzzyEnabled = true))
      .filter(col("entity_id") === "e4").count()
    assert(got == 10L)
  }
}
