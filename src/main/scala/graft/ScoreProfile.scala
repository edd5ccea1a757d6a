package graft

import org.apache.spark.sql.functions._
import graft.kg._

/** Isolated cost breakdown of the scoring + triples stages. */
object ScoreProfile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(300000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val scale = CorpusGen.benchAt(nFiles)
    val spark = Scaling.session(cores)
    Pipeline.sessionConf(spark)
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sp] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val repos = CorpusGen.repos(spark, scale).toDF()
    val entities = CorpusGen.entities(spark, scale).toDF()
    val accounts = CorpusGen.accounts(spark, scale).toDF()
    val accEmb = CorpusGen.accountEmbeddings(spark, scale).toDF()
    val entEmb = CorpusGen.entityEmbeddings(spark, scale).toDF()
    val scan = time("scan")(
      Scan.materialize(Scan.products(repos), Scan.scratchDir(spark)))
    val dict = Dictionary.build(spark, Scan.mentions(scan), accounts)
      .persist(MEMORY_AND_DISK)
    time("dict")(dict.count())
    val cands = CandidateGen.candidates(spark, entities, dict).persist(MEMORY_AND_DISK)
    time("cands")(cands.count())

    time("acc_token_counts")(
      Features.accountTokenCounts(scan, accounts).count())
    val (avec, evec) = Features.textVectors(scan, accounts, entities)
    time("text_vectors")(avec.count() + evec.count())
    time("social_edges")(Features.socialEdges(scan, accounts).count())
    time("sg_vectors")(Features.sgVectors(
      Features.socialEdges(scan, accounts), accEmb).count())

    val feats = Scorer.featurize(cands, entities, accounts, scan,
      accEmb, entEmb).persist(MEMORY_AND_DISK)
    time("featurize_all")(feats.count())
    time("agg name_sim")(feats.agg(sum(col("name_sim"))).collect())
    time("agg text_cos")(feats.agg(sum(col("text_cos"))).collect())
    time("agg sg_cos")(feats.agg(sum(col("sg_cos"))).collect())

    val aligned = Scorer.score(cands, entities, accounts, scan,
      accEmb, entEmb).persist(MEMORY_AND_DISK)
    time("score_full")(aligned.count())
    val reps = Canonicalize.representatives(spark, aligned).persist(MEMORY_AND_DISK)
    time("components")(reps.count())
    val joined = aligned.join(reps, Seq("entity_id"), "left").persist(MEMORY_AND_DISK)
    time("triples_join")(joined.count())
    val tri = Triples.materialize(aligned, reps)
    time("triples_distinct")(tri.count())
    time("triples_again")(tri.count())
    spark.stop()
  }
}
