package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the training-data-pipeline ops). Every SQL-expressible query has a
  * DuckDB oracle in `oracleSql` with IDENTICAL column names and an explicit
  * total-order ORDER BY on both sides so the driver's hash compare is
  * deterministic. Non-SQL-expressible ops (LSH, pipeline stages, …) are
  * rows-only checks.
  */
object SparkEntry {

  /** Flagship: the full KG pipeline (corpus → dictionary → candidates →
    * scoring → triples) on a deterministically synthesized tiny corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    kg.Pipeline.triplesForScale(spark, kg.CorpusGen.Tiny)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
