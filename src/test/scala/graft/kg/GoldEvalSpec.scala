package graft.kg

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Selection-quality gates at Small scale — one shared pipeline run feeds
  * the gold evaluation, the decision-grid sweep, and the A13 candidate
  * diagnostics.
  */
class GoldEvalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val scale = CorpusGen.Small
  private lazy val result = Pipeline.computeForScale(spark, scale)
  private lazy val gold = CorpusGen.gold(spark, scale).toDF()

  /** Round-1 scorer (name + desc-TF cosine + popularity only) measured
    * F1 = 0.9312 at this scale — the bar the round-2 feature set
    * (corpus-text TF-IDF, desc overlap, social graph) must beat.
    */
  private val Round1F1 = 0.9312

  test("gold eval strictly improves on the round-1 feature set") {
    val row = Scorer.evaluate(result.alignments, gold).collect()(0)
    val f1 = row.getAs[Double]("f1")
    assert(f1 > Round1F1, s"F1=$f1 did not beat round-1 $Round1F1")
    assert(row.getAs[Double]("precision") >= 0.95 && row.getAs[Double]("recall") >= 0.94,
      s"P=${row.getAs[Double]("precision")} R=${row.getAs[Double]("recall")}")
  }

  test("default operating point is the decision-grid argmax") {
    val grid = Scorer.gridEvaluation(result.alignments, gold, spark).collect()
    val best = grid.map(_.getAs[Double]("f1")).max
    val conf = KgConf()
    val atDefault = grid.find(g =>
      math.abs(g.getAs[Double]("min_score") - conf.minScore) < 1e-9 &&
        math.abs(g.getAs[Double]("margin") - conf.margin) < 1e-9).get
    assert(atDefault.getAs[Double]("f1") >= best - 1e-9,
      s"default point F1=${atDefault.getAs[Double]("f1")} < grid max $best")
  }

  test("candidate diagnostics: gold accounting is complete (A13)") {
    val rollup = CandidateGen.rollupAll(spark,
      CorpusGen.entities(spark, scale).toDF(), result.dictionary)
    val stats = Scorer.candidateStats(rollup, result.candidates, gold)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def stat(name: String): Long = stats.collectFirst { case (`name`, _, n) => n }.get
    val histSum = stats.collect { case ("order_hist", _, n) => n }.sum
    // every gold pair is either never matched (index loss), matched but cut
    // at topK (cutoff loss), or ranked somewhere in the top-K histogram
    assert(stat("n_gold") == stat("index_loss") + stat("cutoff_loss") + histSum)
    assert(stat("cutoff_loss") == 0) // topK=40 ≫ max fan-in on this corpus
    assert(stat("max_candidates") <= 40)
  }
}
