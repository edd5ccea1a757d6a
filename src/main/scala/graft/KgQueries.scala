package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Query registry for the KG-construction pipeline stages. These run on the
  * deterministically synthesized corpus (BASELINE.json input_hint shape) —
  * DuckDB has no access to that input, so they are rows-only checks; the
  * real correctness gate is KgPipelineSpec's exact-triple-set comparison
  * against the scalar oracle (ScalarOracle.scala).
  *
  * The synthesis scale follows the driver's sf dir so bench reflects a
  * bigger corpus than verify.
  */
object KgQueries {

  private type Q = (SparkSession, String) => DataFrame

  def scaleFor(dir: String): CorpusGen.Scale =
    if (dir.contains("sf0.1")) CorpusGen.benchAt(300000) // 300k files / 15k entities
    else if (dir.contains("sf0.01")) CorpusGen.Small
    else CorpusGen.Tiny

  val corpus: Q = (s, dir) =>
    CorpusGen.repos(s, scaleFor(dir)).toDF()

  val mentions: Q = (s, dir) =>
    Mentions.extract(CorpusGen.repos(s, scaleFor(dir)).toDF())

  val dictionary: Q = (s, dir) => {
    val scale = scaleFor(dir)
    Dictionary.build(s, Mentions.extract(CorpusGen.repos(s, scale).toDF()),
      CorpusGen.accounts(s, scale).toDF())
  }

  val candidates: Q = (s, dir) => {
    val scale = scaleFor(dir)
    val dict = Dictionary.build(s,
      Mentions.extract(CorpusGen.repos(s, scale).toDF()),
      CorpusGen.accounts(s, scale).toDF())
    CandidateGen.candidates(s, CorpusGen.entities(s, scale).toDF(), dict)
  }

  val triples: Q = (s, dir) =>
    Pipeline.triplesForScale(s, scaleFor(dir))

  val evaluation: Q = (s, dir) => {
    val scale = scaleFor(dir)
    val r = Pipeline.compute(s,
      CorpusGen.repos(s, scale).toDF(),
      CorpusGen.entities(s, scale).toDF(),
      CorpusGen.accounts(s, scale).toDF())
    Scorer.evaluate(r.alignments, CorpusGen.gold(s, scale).toDF())
  }

  def all: Map[String, Q] = Map(
    "kg_corpus" -> corpus,
    "kg_mentions" -> mentions,
    "kg_dictionary" -> dictionary,
    "kg_candidates" -> candidates,
    "kg_triples" -> triples,
    "kg_evaluation" -> evaluation,
  )

  def oracles: Map[String, String] = Map.empty
}
