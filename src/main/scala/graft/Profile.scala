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

    val scan = time("scan_count")(
      Scan.materialize(Scan.products(repos), Scan.scratchDir(spark)))
    val mentions = Scan.mentions(scan)

    val dict = Dictionary.build(spark, mentions, accounts).persist(MEMORY_AND_DISK)
    time("dictionary")(dict.count())

    // candidates sub-steps
    val qn = CandidateGen.queryNames(entities)
    time("qn_count")(qn.count())
    val fullRollup = broadcast(qn).join(dict, qn("qname") === dict("name"))
      .groupBy(col("entity_id"), col("account_id"))
      .agg(sum(col("freq")).as("freq")).persist(MEMORY_AND_DISK)
    time("rollup")(fullRollup.count())
    val dictNames = dict.select(col("name")).distinct().persist(MEMORY_AND_DISK)
    time("dict_names")(dictNames.count())
    val lonely = qn.join(fullRollup.select(col("entity_id")).distinct(),
      Seq("entity_id"), "left_anti")
    val fuzzy = Blocking.fuzzyNameMatches(lonely, dictNames, 0.5)
    time("fuzzy_matches")(fuzzy.count())

    val cands = CandidateGen.candidates(spark, entities, dict)
      .persist(MEMORY_AND_DISK)
    time("candidates")(cands.count())

    // feature-table sub-steps
    val (accVec, entVec) = Features.textVectors(scan, accounts, entities)
    time("text_vectors")(accVec.count() + entVec.count())
    val sgv = Features.sgVectors(Features.socialEdges(scan, accounts),
      CorpusGen.accountEmbeddings(spark, scale).toDF())
    time("social_graph")(sgv.count())

    val aligned = Scorer.score(cands, entities, accounts, scan,
      CorpusGen.accountEmbeddings(spark, scale).toDF(),
      CorpusGen.entityEmbeddings(spark, scale).toDF()).persist(MEMORY_AND_DISK)
    time("scoring")(aligned.count())

    val reps = time("components")(
      Canonicalize.representatives(spark, aligned).persist(MEMORY_AND_DISK))
    time("components_count")(reps.count())

    val triples = Triples.materialize(aligned, reps)
    time("triples_distinct")(triples.count())

    spark.stop()
  }
}
