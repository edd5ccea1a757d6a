package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Candidate-pair fan-out + stage-cost audit for the LSH dedup operators at
  * a given sf — verifies blocking selectivity holds as data grows and shows
  * which stage (signatures, pair join, verify) dominates.
  * Usage: sbt "runMain graft.OpsProfile [sfDir]"
  */
object OpsProfile {

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ops] $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def bucketAudit(label: String, sigs: DataFrame, keyCols: Seq[String]): Unit = {
    val sizes = sigs.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("sz"))
    val row = sizes.agg(
      sum(col("sz") * (col("sz") - 1) / 2).as("cand_pairs"),
      max(col("sz")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).collect()(0)
    println(s"[ops] $label cand_pairs=${row.get(0)} max_bucket=${row.get(1)} buckets=${row.get(2)}")
  }

  /** Selectivity of the lossless size-ratio prune on this corpus: distinct
    * candidate pairs vs pairs surviving min/max set-size ≥ threshold (the
    * rows the verify join actually ships arrays for).
    */
  private def pruneAudit(label: String, sigs: DataFrame, docs: DataFrame,
      setUdf: org.apache.spark.sql.expressions.UserDefinedFunction,
      threshold: Double): Unit = {
    val pairs = Dedup.candidatePairs(sigs, 256)
    val sets = docs.select(col("doc_id"), setUdf(col("text")).as("s"))
    val kept = Dedup.sizePrunedPairs(pairs, sets, "s", threshold).count()
    println(s"[ops] $label distinct_pairs=${pairs.count()} size_prune_kept=$kept")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Scaling.session(32)
    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    println(s"[ops] docs=${docs.count()} embs=${embs.count()}")

    val mh = Dedup.minhashBands(docs)
    time("minhash sigs")(mh.count())
    bucketAudit("minhash", mh, Seq("band_id", "band_hash"))
    pruneAudit("minhash", mh, docs,
      udf((t: String) => Dedup.shingleHashedSetOf(t, 3)), 0.7)
    time("minhash full")(println(s"[ops] minhash pairs=${Dedup.minhashNearDups(docs).count()}"))

    val ng = Dedup.ngramBands(docs)
    time("ngram sigs")(ng.count())
    bucketAudit("ngram", ng, Seq("band_id", "band_hash"))
    pruneAudit("ngram", ng, docs,
      udf((t: String) => Dedup.ngramHashedSetOf(t, 4)), 0.8)
    time("ngram full")(println(s"[ops] ngram pairs=${Dedup.ngramJaccard(docs).count()}"))

    time("simhash full")(println(s"[ops] simhash pairs=${Dedup.simhashNearDups(docs).count()}"))

    val nVec = embs.count()
    val emb = Dedup.embeddingBands(embs, nVec)
    bucketAudit("embedding", emb, Seq("table_id", "bits"))
    time("embedding full")(println(
      s"[ops] embedding pairs=${Dedup.embeddingNearDups(embs, nVec).count()}"))
    spark.stop()
  }
}
