package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup / similarity / text-analysis operator specs with planted inputs. */
class OpsSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val d = docsDf(Seq(1L -> "aa bb cc", 2L -> "aa bb cc", 3L -> "zz"))
    val r = Dedup.exact(d).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(r == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds near-duplicates, not unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 7) "CHANGED" else s"tok$i").mkString(" ")
    val far = (100 to 140).map(i => s"other$i").mkString(" ")
    val pairs = Dedup.minhashNearDups(docsDf(Seq(1L -> base, 2L -> near, 3L -> far)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash finds near-duplicates within hamming distance") {
    // construct a provably-near pair: search deterministic perturbations
    // until hamming ≤ 3 (pigeonhole: ≤3 bit flips always leave one of the
    // 4 16-bit bands intact, so LSH banding MUST surface the pair)
    val baseTokens = (1 to 60).map(i => s"tok$i")
    val base = baseTokens.mkString(" ")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val h0 = Dedup.simhashScalar(baseTokens)
    val near = (0 until 200).iterator
      .map(k => baseTokens :+ s"pad$k")
      .find(t => ham(Dedup.simhashScalar(t), h0) <= 3)
      .map(_.mkString(" ")).get
    val far = (200 to 260).map(i => s"other$i").mkString(" ")
    assert(ham(Dedup.simhashScalar(far.split(" ").toSeq), h0) > 3)
    val pairs = Dedup.simhashNearDups(docsDf(Seq(1L -> base, 2L -> near, 3L -> far)), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard finds shifted near-duplicate text") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base + " x"
    val far = "completely different content with nothing shared whatsoever here"
    val pairs = Dedup.ngramJaccard(docsDf(Seq(1L -> base, 2L -> near, 3L -> far)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding LSH near-dup finds planted similar vectors") {
    import spark.implicits._
    val v = (0 until 64).map(i => math.sin(i * 0.7).toFloat).toArray
    val near = v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val far = (0 until 64).map(i => math.cos(i * 2.3 + 1).toFloat).toArray
    val df = Seq((1L, v), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("IVF ANN achieves decent recall vs brute force on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(e, q, 10)
    val approx = Similarity.ivfTopK(e, q, 10, nCells = 16, nProbe = 4, dim = 64)
    val hits = Similarity.recallAtK(exact, approx)
      .agg(sum(col("hits"))).collect()(0).getLong(0)
    assert(hits >= 20, s"recall@10 over 5 queries too low: $hits/50") // ≥40%
  }

  test("brute-force ANN: self is always rank 1") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding"))
    val r1 = Similarity.bruteForceTopK(e, q, 10).filter(col("rnk") === 1)
      .select(col("query_id"), col("vec_id")).collect()
    assert(r1.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("langid picks the language with most stopword hits") {
    val d = docsDf(Seq(
      1L -> "the cat and the dog of the house is that big",
      2L -> "der hund und die katze ist nicht mit ein von zu",
      3L -> "xyzzy qwerty plugh"))
    val r = TextAnalysis.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("quality metrics are computed per document") {
    val d = docsDf(Seq(1L -> "The cat. IS BIG! 42 ok."))
    val row = TextAnalysis.quality(d).collect()(0)
    assert(row.getAs[Long]("n_chars") == 23L)
    assert(row.getAs[Double]("punct_ratio") > 0.0)
    assert(row.getAs[Double]("digit_ratio") > 0.0)
  }

  test("multimodal: batched fake decode produces per-kind stats") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val r = Multimodal.featureStats(spark, d).collect()
    assert(r.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(r.map(_.getAs[Long]("n")).sum == d.count())
  }

  test("multimodal: fake decode is deterministic") {
    val (s1, f1) = Multimodal.fakeDecodeFeatures("hello world".getBytes, 100, 10)
    val (s2, f2) = Multimodal.fakeDecodeFeatures("hello world".getBytes, 100, 10)
    assert(s1 == s2 && f1.toSeq == f2.toSeq && s1 == 10)
  }
}
