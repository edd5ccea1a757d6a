package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Candidate-pair fan-out audit for the LSH dedup operators at a given sf —
  * verifies blocking selectivity holds as data grows.
  * Usage: sbt "runMain graft.OpsProfile [sfDir]"
  */
object OpsProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Scaling.session(16)
    val docs = Tables.documents(spark, dir)
    val n = docs.count()

    val sigs = Dedup.minhashBands(docs)
    val bucketSizes = sigs.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("sz"))
    val pairs = bucketSizes.agg(
      sum(col("sz") * (col("sz") - 1) / 2).as("cand_pairs"),
      max(col("sz")).as("max_bucket")).collect()(0)
    println(s"[ops] docs=$n minhash cand_pairs=${pairs.get(0)} max_bucket=${pairs.get(1)}")

    val t0 = System.nanoTime()
    val out = Dedup.minhashNearDups(docs).count()
    println(f"[ops] minhash near-dups=$out wall=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val outN = Dedup.ngramJaccard(docs).count()
    println(f"[ops] ngram near-dups=$outN wall=${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
