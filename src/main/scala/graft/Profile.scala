package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** Per-stage wall-time profile of the KG pipeline at a given corpus size
  * and parallelism — finds which stage stops scaling.
  * Usage: sbt "runMain graft.Profile <nFiles> <cores>"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val scale = CorpusGen.benchAt(nFiles)
    val spark = Scaling.session(cores)
    Pipeline.sessionConf(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val repos = CorpusGen.repos(spark, scale).toDF()
    time("corpus_gen_count")(repos.count())
    val entities = CorpusGen.entities(spark, scale).toDF()
    val accounts = CorpusGen.accounts(spark, scale).toDF()
    time("accounts_count")(accounts.count())

    val mentions = Mentions.extract(repos)
    time("mentions_count")(mentions.count())

    val dict = Dictionary.build(spark, mentions, accounts).persist(MEMORY_AND_DISK)
    time("dictionary")(dict.count())

    val cands = CandidateGen.candidates(spark, entities, dict)
      .persist(MEMORY_AND_DISK)
    time("candidates")(cands.count())

    val aligned = Scorer.score(cands, entities, accounts).persist(MEMORY_AND_DISK)
    time("scoring")(aligned.count())

    val reps = time("components")(
      Canonicalize.representatives(spark, aligned).persist(MEMORY_AND_DISK))
    time("components_count")(reps.count())

    val triples = Triples.materialize(aligned, reps)
    time("triples_distinct")(triples.count())

    spark.stop()
  }
}
