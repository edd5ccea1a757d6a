package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expression specs: codegen path, interpreted path, and
  * SQL registration all agree with the shared scalar implementation.
  */
class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  private val pairs = Seq(
    ("martha", "marhta"), ("dwayne", "duane"), ("abcdef", "abxxxx"),
    ("same", "same"), ("", ""), ("a", "b"),
    ("Customer#000000001", "Customer#000000010"))

  test("JaroWinklerExpr (codegen) equals the scalar implementation") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    val want = pairs.map { case (a, b) => graft.kg.Text.jaroWinkler(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("jaro_winkler is registered and usable from SQL") {
    import spark.implicits._
    JaroWinkler.register(spark)
    pairs.toDF("a", "b").createOrReplaceTempView("jw_pairs")
    val got = spark.sql("SELECT jaro_winkler(a, b) FROM jw_pairs").collect()
      .map(_.getDouble(0))
    val want = pairs.map { case (a, b) => graft.kg.Text.jaroWinkler(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("nulls propagate (BinaryExpression null-intolerant default)") {
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    val r = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("F19 vector concat: built-in concat appends feature arrays in order") {
    // SURVEY §2 F19 (LSAVectorProvider.java:54-77 analogue: the LSA vector
    // concatenated with extra feature dims) — the one §2 row that had
    // neither a query nor a spec
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.5))).toDF("a", "b")
    val got = df.select(concat(col("a"), col("b")).as("v"))
      .collect()(0).getSeq[Double](0)
    assert(got == Seq(1.0, 2.0, 3.0, 4.5))
  }
}
