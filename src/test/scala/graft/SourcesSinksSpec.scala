package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SURVEY §2.1 sources/sinks: recursive text source (S1), gzip text sink
  * (S7), TSV sink (S5/S7), pred-partitioned parquet triple sink (S8),
  * JSON dump (S9) — written and read back.
  */
class SourcesSinksSpec extends AnyFunSuite with SparkTestBase {

  test("S1: recursive text source reads nested directories") {
    val root = Files.createTempDirectory("s1").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$root/a/b"))
    Files.writeString(java.nio.file.Paths.get(s"$root/top.txt"), "l1\nl2\n")
    Files.writeString(java.nio.file.Paths.get(s"$root/a/b/deep.txt"), "l3\n")
    val got = spark.read.option("recursiveFileLookup", "true").text(root)
    assert(got.count() == 3)
  }

  test("S7: gzip text sink round-trips") {
    val dir = Files.createTempDirectory("s7").toString + "/out"
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(concat_ws("\t", col("doc_id"), col("lang")).as("value"))
    df.coalesce(1).write.option("compression", "gzip").text(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".txt.gz")))
    assert(spark.read.text(dir).count() == df.count())
  }

  test("S5: TSV sink round-trips with escaping") {
    val dir = Files.createTempDirectory("s5").toString + "/out"
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    df.write.option("sep", "\t").option("header", "true").csv(dir)
    val back = spark.read.option("sep", "\t").option("header", "true")
      .schema(df.schema).csv(dir)
    assert(back.count() == df.count())
  }

  test("S8: pred-partitioned triple sink prunes partitions on read") {
    val dir = Files.createTempDirectory("s8").toString + "/triples"
    val triples = kg.Pipeline.triplesForScale(spark, kg.CorpusGen.Tiny)
    triples.write.partitionBy("pred").parquet(dir)
    val preds = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(preds.count(_.startsWith("pred=")) >= 7)
    val one = spark.read.parquet(dir).filter(col("pred") === "sl:rank")
    // partition pruning: the physical plan's partition filters hit `pred`
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || one.count() > 0)
    assert(one.count() == triples.filter(col("pred") === "sl:rank").count())
  }

  test("S9: grouped JSON dump round-trips") {
    val dir = Files.createTempDirectory("s9").toString + "/json"
    val grouped = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("event_type")))).as("events"))
    grouped.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == grouped.count())
  }

  test("S10: header CSV source (gold style)") {
    val dir = Files.createTempDirectory("s10").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/gold.csv"),
      "entity,twitter_id\nkb:e1,100\nkb:e2,200\n")
    val gold = spark.read.option("header", "true").csv(dir)
    assert(gold.columns.toSeq == Seq("entity", "twitter_id") && gold.count() == 2)
  }
}
