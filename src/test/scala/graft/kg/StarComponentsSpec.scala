package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The closed-form star components (Canonicalize.starComponents) must agree
  * with the generic iterative min-label loop on every graph that satisfies
  * the star precondition (≤1 edge per src) — including the real pipeline's
  * strong-alignment edges, where the precondition holds by construction
  * (the argmax-with-margin window emits at most one alignment per entity).
  */
class StarComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def genericLabels(edges: org.apache.spark.sql.DataFrame) =
    Canonicalize.components(spark, edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

  private def starLabels(edges: org.apache.spark.sql.DataFrame) =
    Canonicalize.starComponents(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

  test("planted stars: closed form equals the iterative loop on src nodes") {
    import spark.implicits._
    // three stars: shared-account star (e2,e5→a1), a singleton edge
    // (e9→a7), and a star whose CENTER is the component minimum (e8,e7→a0
    // — account IRI sorts below both entities)
    val edges = Seq(
      ("e2", "a1"), ("e5", "a1"),
      ("e9", "a7"),
      ("e8", "a0"), ("e7", "a0")).toDF("src", "dst")
    val star = starLabels(edges)
    val generic = genericLabels(edges)
    assert(star == generic.view.filterKeys(star.keySet).toMap,
      s"star=$star generic=$generic")
    assert(star("e2") == "a1" && star("e5") == "a1") // a1 < e2 < e5
    assert(star("e7") == "a0" && star("e8") == "a0")
    assert(star("e9") == "a7")
  }

  test("pipeline strong edges: star path equals the loop, end to end") {
    val aligned = Pipeline.computeForScale(spark, CorpusGen.Tiny).alignments
    // Tiny scores don't reach the default strong threshold (empty edge set
    // → vacuous equality), so lower it: the edge SHAPE (≤1 per entity, many
    // entities per account IRI) is what the closed form depends on, and it
    // holds at any threshold because is_alignment is argmax-unique
    val edges = Canonicalize.strongEdges(aligned, KgConf(strongThreshold = 0.3))
    // precondition audit: at most one strong edge per entity
    val maxEdges = edges.groupBy(col("src")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxEdges == 1L, s"argmax emitted $maxEdges edges for one entity")
    val star = starLabels(edges)
    val generic = genericLabels(edges)
    assert(star == generic.view.filterKeys(star.keySet).toMap)
    assert(star.nonEmpty, "no strong edges at Tiny — vacuous equality")
  }

  test("empty edge set: every entity represents itself") {
    import spark.implicits._
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    assert(starLabels(edges).isEmpty)
  }
}
