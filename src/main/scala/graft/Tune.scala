package graft

import org.apache.spark.sql.functions._
import graft.kg._

/** Dev tool: gold-eval + decision-grid readout at Small scale — the
  * evidence for KgConf weight/operating-point choices.
  * Usage: sbt "runMain graft.Tune [tiny|small|bench]"
  */
object Tune {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.getOrElse("small") match {
      case "tiny" => CorpusGen.Tiny
      case "bench" => CorpusGen.Bench
      case _ => CorpusGen.Small
    }
    val spark = Scaling.session(16)
    val r = Pipeline.computeForScale(spark, scale)
    val gold = CorpusGen.gold(spark, scale).toDF()
    val eval = Scorer.evaluate(r.alignments, gold).collect()(0)
    println(s"[tune] eval tp=${eval.getAs[Long]("tp")} fp=${eval.getAs[Long]("fp")} " +
      f"fn=${eval.getAs[Long]("fn")} P=${eval.getAs[Double]("precision")}%.4f " +
      f"R=${eval.getAs[Double]("recall")}%.4f F1=${eval.getAs[Double]("f1")}%.4f")
    val grid = Scorer.gridEvaluation(r.alignments, gold, spark)
      .orderBy(col("f1").desc, col("min_score"), col("margin"))
    grid.limit(12).collect().foreach { g =>
      println(f"[tune] grid min_score=${g.getAs[Double]("min_score")}%.2f " +
        f"margin=${g.getAs[Double]("margin")}%.1f P=${g.getAs[Double]("precision")}%.4f " +
        f"R=${g.getAs[Double]("recall")}%.4f F1=${g.getAs[Double]("f1")}%.4f")
    }
    val stats = Scorer.candidateStats(r.rollup,
      r.candidates, gold).orderBy(col("stat"), col("ord")).collect()
    stats.take(8).foreach(s => println(s"[tune] stat ${s.mkString(" ")}"))
    // dump per-pair features + gold for offline weight sweeps
    val feats = Scorer.featurize(r.candidates,
      CorpusGen.entities(spark, scale).toDF(),
      CorpusGen.accounts(spark, scale).toDF(),
      r.scan,
      CorpusGen.accountEmbeddings(spark, scale).toDF(),
      CorpusGen.entityEmbeddings(spark, scale).toDF())
    // scale-suffixed dump dirs so a Small fit can cross-validate on a Tiny
    // dump without manual renames (tools/tune_weights.py takes the suffix)
    feats.join(gold.select(col("entity").as("entity_id"),
        col("accountId").as("gold_account")), Seq("entity_id"), "left")
      .coalesce(1).write.mode("overwrite").parquet(s"/tmp/tune_features_${scale.name}")
    gold.coalesce(1).write.mode("overwrite").parquet(s"/tmp/tune_gold_${scale.name}")
    println(s"[tune] features dumped to /tmp/tune_features_${scale.name}" +
      s" (+ /tmp/tune_gold_${scale.name})")
    spark.stop()
  }
}
