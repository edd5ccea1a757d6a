package graft

import org.apache.spark.sql.functions._
import graft.kg._

/** Isolated connected-components profile at bench scale. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val scale = CorpusGen.benchAt(nFiles)
    val spark = Scaling.session(cores)
    Pipeline.sessionConf(spark)
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val repos = CorpusGen.repos(spark, scale).toDF()
    val entities = CorpusGen.entities(spark, scale).toDF()
    val accounts = CorpusGen.accounts(spark, scale).toDF()
    val scan = Scan.materialize(Scan.products(repos), Scan.scratchDir(spark))
    val dict = Dictionary.build(spark, Scan.mentions(scan), accounts)
      .persist(MEMORY_AND_DISK)
    val cands = CandidateGen.candidates(spark, entities, dict)
    val aligned = Scorer.score(cands, entities, accounts, scan,
      CorpusGen.accountEmbeddings(spark, scale).toDF(),
      CorpusGen.entityEmbeddings(spark, scale).toDF()).persist(MEMORY_AND_DISK)
    println(s"[cc] aligned rows=${aligned.count()}")
    val edges = Canonicalize.strongEdges(aligned).persist(MEMORY_AND_DISK)
    println(s"[cc] strong edges=${edges.count()}")
    val t0 = System.nanoTime()
    val comps = Canonicalize.components(spark, edges, verbose = true)
    println(s"[cc] components rows=${comps.count()} wall=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
