package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY §2.9 X4; north_star "salted repartitioning
  * and AQE skew-join splitting").
  *
  * AQE's skew-join splitting covers join-side skew at runtime (enabled in
  * Pipeline.sessionConf); these helpers cover AGGREGATION skew, which AQE
  * does not split: a two-phase salted aggregate spreads a hot group key
  * over `salt` subkeys for the partial phase, then combines.
  *
  * The salt is derived from a hash of stable columns — NOT rand() — so
  * results stay deterministic and resumable (SURVEY §7.3 risk 4).
  */
object Skew {

  /** Deterministic salt in [0, n) from stable column values. */
  def saltCol(n: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted sum: groupBy(keys :+ salt).sum → groupBy(keys).sum.
    * Equivalent to a plain groupBy(keys).agg(sum) on any input (spec-proven)
    * but immune to a single hot key saturating one reducer.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int, saltSource: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", saltCol(salt, saltSource.map(col): _*))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial.groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted broadcast-replicated join for a skewed big side against a small
    * dim: the big side gets a deterministic salt, the small side is
    * replicated `salt` times, and the join key becomes (key, salt) — the
    * classic replicate-and-salt pattern for when AQE cannot kick in (e.g.
    * the big side is already partitioned by the hot key upstream).
    */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, bigStableCols: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salt, bigStableCols.map(col): _*))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(broadcast(replicated), Seq(key, "__salt")).drop("__salt")
  }
}
