package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorsSpec extends AnyFunSuite with SparkTestBase {

  test("BowMerge unions term-count maps per key") {
    import spark.implicits._
    val rows = Seq(
      (1L, Map("a" -> 2L, "b" -> 1L)),
      (1L, Map("a" -> 1L, "c" -> 4L)),
      (2L, Map("z" -> 1L)))
    val ds = rows.toDS()
    val agg = new Aggregators.BowMerge().toColumn
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(got(1L) == Map("a" -> 3L, "b" -> 1L, "c" -> 4L))
    assert(got(2L) == Map("z" -> 1L))
  }

  test("WeightedVecAvg computes Σwᵢvᵢ/Σwᵢ (J8 semantics)") {
    import spark.implicits._
    val rows: Seq[(Long, (Seq[Double], Double))] = Seq(
      (1L, (Seq(1.0, 0.0), 1.0)),
      (1L, (Seq(0.0, 2.0), 3.0)),
      (2L, (Seq(5.0, 5.0), 0.0))) // zero total weight → zero vector
    val ds = rows.toDS()
    val agg = new Aggregators.WeightedVecAvg(2).toColumn
    val got = ds.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    assert(got(1L) == Seq(0.25, 1.5))
    assert(got(2L) == Seq(0.0, 0.0))
  }

  test("weighted embedding average over real tables (explode→join→agg shape)") {
    import spark.implicits._
    // events provide (user → vec weight) edges; embeddings are the vectors
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), pmod(col("event_id"), lit(500)).as("vec_id"),
        col("value").as("w"))
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val joined = ev.join(emb, Seq("vec_id"))
      .select(col("user_id"),
        col("embedding").cast("array<double>").as("v"), col("w"))
      .as[(Long, Seq[Double], Double)]
    val agg = new Aggregators.WeightedVecAvg(64).toColumn
    val got = joined.groupByKey(_._1).mapValues(t => (t._2, t._3)).agg(agg).collect()
    assert(got.nonEmpty && got.forall(_._2.length == 64))
  }
}
