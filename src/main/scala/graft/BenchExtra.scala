package graft

import org.apache.spark.sql.SparkSession
import graft.kg._

/** Extra (non-contract) benchmarks: noop-sink isolation of pipeline
  * sub-steps (guide §1.4) so stage costs are attributable without the
  * sink. Each step runs `reps` times in one warm JVM; all reps printed.
  * Usage: sbt "runMain graft.BenchExtra [nFiles] [cores] [reps]"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(300000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Scaling.session(cores)
    Pipeline.sessionConf(spark)
    val scale = CorpusGen.benchAt(nFiles)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String)(f: => Unit): Unit =
      (1 to reps).foreach { r =>
        spark.sparkContext.setJobDescription(s"$label#$r")
        val t0 = System.nanoTime()
        f
        println(f"[extra] $label%-28s rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        spark.sparkContext.setJobDescription(null)
      }

    val repos = CorpusGen.repos(spark, scale).toDF()
    time("synthesis_noop")(noop(repos))
    time("synthesis_nocontent_noop")(noop(repos.drop("content")))
    time("sha_only_noop")(noop(Mentions.withSha(repos)
      .select(org.apache.spark.sql.functions.col("content_sha"))))
    time("products_noop")(noop(Scan.products(repos)))
    time("products_write") {
      val dir = Scan.scratchDir(spark)
      Scan.materialize(Scan.products(repos), dir)
      Scan.dropScratch(spark, dir)
    }
    spark.stop()
  }
}
