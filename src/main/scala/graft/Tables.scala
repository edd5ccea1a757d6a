package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (see /root/repo/TESTDATA.md).
  *
  * Every table is a single parquet file under the scale-factor dir. Reads are
  * plain `spark.read.parquet` so Catalyst gets full pushdown/pruning freedom.
  */
object Tables {
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame = load(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
