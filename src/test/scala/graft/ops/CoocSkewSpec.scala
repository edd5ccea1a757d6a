package graft.ops

import graft.SparkTestBase
import graft.kg.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-occurrence semantics against hand-computed expectations, plus the
  * salted-aggregation equivalence proof (X4).
  */
class CoocSkewSpec extends AnyFunSuite with SparkTestBase {

  test("co-occurrence pairs: window weights 1/offset, symmetric, self=1") {
    import spark.implicits._
    // one doc "a b a": ids a=0, b=1 (a freq 2 > b freq 1)
    val docs = Seq((1L, "a b a a b a a b a a b a")).toDF("doc_id", "text")
    // build a tiny dictionary by hand to keep the expectation simple
    val dict = Seq(("a", 8L, 0L), ("b", 4L, 1L)).toDF("token", "freq", "id")
    val got = Cooccurrence.cooccurrence(docs, dict, window = 2)
      .select(col("l"), col("r"), col("weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // tokens: a b a a b a a b a a b a (12 tokens, pattern aba repeated)
    // self: 12 occurrences → (0,0) gets 8 from a-selfs? a appears 8 times,
    // b 4 times → self (0,0)=8, (1,1)=4; window-2 pairs:
    // offsets 1,2 over the sequence; count pair types:
    // seq: a b a a b a a b a a b a
    // offset1 pairs: ab,ba,aa,ab,ba,aa,ab,ba,aa,ab,ba → (0,1):8? count ab=4,ba=4 → 8 pairs w=1
    //   aa at positions (2,3),(5,6),(8,9) → 3 pairs w=1
    // offset2 pairs: (a,a)x? seq[i],seq[i+2]: aa,bb?... compute:
    // i:0 a-a,1 b-a? seq2: positions (0,2)=aa,(1,3)=ba,(2,4)=ab,(3,5)=aa,
    // (4,6)=ba? seq[4]=b,seq[6]=a → ba, (5,7)=ab? seq5=a seq7=b → ab,
    // (6,8)=aa,(7,9)=ba,(8,10)=ab,(9,11)=aa → offset2: aa=4 (w .5 each),
    // ab/ba=6 (w .5 each)
    // totals: (0,0)=8(self)+3(off1)+4*0.5(off2)=13.0
    //         (1,1)=4(self)
    //         (0,1)=8(off1)+6*0.5(off2)=11.0
    assert(got == Set((0L, 0L, 13.0), (1L, 1L, 4.0), (0L, 1L, 11.0)))
  }

  test("docIds: map-side encode preserves token order and drops OOV") {
    import spark.implicits._
    val docs = Seq((1L, "a z b A a-q c"), (2L, "zz qq"), (3L, ""))
      .toDF("doc_id", "text")
    val dict = Seq(("a", 3L, 0L), ("b", 1L, 1L), ("c", 1L, 2L))
      .toDF("token", "freq", "id")
    val got = Cooccurrence.docIds(docs, dict)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    // "a-q" splits on the hyphen into in-vocab "a" + OOV "q"; "A" lowers
    assert(got(1L) == Seq(0L, 1L, 0L, 0L, 2L))
    // all-OOV and empty docs still get a row (empty ids), matching the
    // pairsUdf contract (it emits nothing for an empty array)
    assert(got.get(2L).exists(_.isEmpty) && got.get(3L).exists(_.isEmpty))
  }

  test("docIds encodes map-side: zero exchanges in the plan") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val dict = Seq(("a", 1L, 0L)).toDF("token", "freq", "id")
    val plan = Cooccurrence.docIds(docs, dict)
      .queryExecution.executedPlan.toString
    // the dictionary is collected to a driver map before planning, so the
    // encode is a pure projection over docs — the token-level
    // posexplode → join → collect_list shuffle of the old formulation
    // must not reappear
    assert(!plan.contains("Exchange"), plan)
  }

  test("marginals zero-fill covers the whole id space") {
    import spark.implicits._
    val cooc = Seq((0L, 0L, 2.0), (0L, 1L, 1.0)).toDF("l", "r", "weight")
    val got = Cooccurrence.marginals(spark, cooc, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == Map(0L -> 3.0, 1L -> 1.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("dictionary ids are dense ranks by (freq desc, token asc)") {
    import spark.implicits._
    val docs = Seq((1L, "x x x y y z")).toDF("doc_id", "text")
    val got = Cooccurrence.tokenDictionary(docs, minFreq = 0, topV = 10)
      .collect().map(r => (r.getString(0), r.getInt(2))).toMap
    assert(got == Map("x" -> 0, "y" -> 1, "z" -> 2))
  }

  test("sharded write produces one directory per shard pair") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h a b c d")).toDF("doc_id", "text")
    val dict = Cooccurrence.tokenDictionary(docs, minFreq = 0, topV = 10)
    val cooc = Cooccurrence.cooccurrence(docs, dict, shards = 2)
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    Cooccurrence.writeSharded(cooc, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(parts.forall(_.startsWith("shard_l=")) && parts.nonEmpty)
    val reread = spark.read.parquet(dir)
    assert(reread.count() == cooc.count())
  }

  test("salted sum equals plain sum (skew-immune aggregation, X4)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plain = ev.groupBy(col("event_type")).agg(sum(col("value")).as("sum_value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(ev, Seq("event_type"), "value",
      salt = 8, saltSource = Seq("event_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(v - salted(k)) < 1e-6) }
  }

  test("salted broadcast join equals plain join") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("signup", 4))
      .toDF("event_type", "code")
    val plain = ev.join(dim, Seq("event_type")).agg(sum(col("code"))).collect()(0).getLong(0)
    val salted = Skew.saltedBroadcastJoin(ev, dim, "event_type",
      salt = 4, bigStableCols = Seq("event_id"))
      .agg(sum(col("code"))).collect()(0).getLong(0)
    assert(plain == salted)
  }

  test("tfidf: known two-doc example") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TfIdf.tfidf(docs)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(2))).toMap
    val n = 2.0
    def idf(df: Int): Double = math.log((n + 1) / (df + 1)) + 1
    def tf(c: Int): Double = 1.0 + math.log(c)
    def rnd(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "a")) == rnd(tf(2) * idf(1)))
    assert(got((1L, "b")) == rnd(tf(1) * idf(2)))
    assert(got((2L, "c")) == rnd(tf(1) * idf(1)))
  }
}
