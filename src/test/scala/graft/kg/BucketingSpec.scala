package graft.kg

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB path for the featurize pair join: candidates and the entity
  * feature dim written as tables bucketed + sorted on entity_id, joined
  * without ANY Exchange. This is what replaces the broadcast hint when the
  * entity dim grows with the corpus (CorpusGen.benchAt: entities = files/20)
  * past the broadcast budget.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed entity_id join plans with zero Exchange") {
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val wasBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the planner to actually co-locate: without this the tiny dim
    // would be broadcast and the assertion would test nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val scale = CorpusGen.Tiny
      val entities = CorpusGen.entities(spark, scale).toDF()
      val dict = Dictionary.build(spark,
        Mentions.extract(CorpusGen.repos(spark, scale).toDF()),
        CorpusGen.accounts(spark, scale).toDF())
      val cands = CandidateGen.candidates(spark, entities, dict)
      val dim = entities.select(col("id").as("entity_id"), col("kind"))
      val joined = Scorer.bucketedEntJoin(spark, 8, "graft_spec_join")(cands, dim)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed pair join still shuffles: ${joined.queryExecution.executedPlan}")
      // and it is a real join over the bucketed scans, same row multiset as
      // the broadcast form
      val viaBroadcast = cands.join(broadcast(dim), Seq("entity_id"))
      assert(joined.count() == viaBroadcast.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", wasBc)
    }
  }

  test("no shuffle in the featurize plan carries the wide entity payload") {
    // join order inside featurize: narrow candidates ⋈ acc first (shuffle on
    // account_id moves only (entity_id, account_id, freq, rank)), entity dim
    // broadcast LAST — the wide per-entity arrays (name list, hashed tvec
    // entries, embedding, abstract tokens) must reach the pair rows map-side
    // only, never through an Exchange. At 100 TB that wide shuffle was the
    // single largest data movement of the pipeline.
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scale = CorpusGen.Tiny
      val repos = CorpusGen.repos(spark, scale).toDF()
      val entities = CorpusGen.entities(spark, scale).toDF()
      val accounts = CorpusGen.accounts(spark, scale).toDF()
      val dict = Dictionary.build(spark, Mentions.extract(repos), accounts)
      val cands = CandidateGen.candidates(spark, entities, dict)
      val feats = Scorer.featurize(cands, entities, accounts, repos,
        CorpusGen.accountEmbeddings(spark, scale).toDF(),
        CorpusGen.entityEmbeddings(spark, scale).toDF())
      // dim-side builds (|entities| rows) may legitimately exchange their
      // own payload; the killer is a PAIR-level shuffle — rows keyed by
      // account_id that also drag the per-entity arrays along
      val wide = Set("names_norm", "abs_tok", "e_tvec", "evec")
      val offenders = feats.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.output.exists(_.name == "account_id") &&
              e.output.exists(a => wide.contains(a.name)) => e
      }
      assert(offenders.isEmpty,
        s"entity payload columns cross a pair shuffle: ${offenders.map(_.output.map(_.name))}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }

  test("bucketed featurize output is identical to the broadcast path") {
    val scale = CorpusGen.Tiny
    val repos = CorpusGen.repos(spark, scale).toDF()
    val entities = CorpusGen.entities(spark, scale).toDF()
    val accounts = CorpusGen.accounts(spark, scale).toDF()
    val accEmb = CorpusGen.accountEmbeddings(spark, scale).toDF()
    val entEmb = CorpusGen.entityEmbeddings(spark, scale).toDF()
    val dict = Dictionary.build(spark, Mentions.extract(repos), accounts)
    val cands = CandidateGen.candidates(spark, entities, dict)

    def key(r: org.apache.spark.sql.Row): (String, Long) =
      (r.getAs[String]("entity_id"), r.getAs[Long]("account_id"))
    val base = Scorer.featurize(cands, entities, accounts, repos, accEmb, entEmb)
      .collect().map(r => key(r) -> r.toSeq).toMap
    val bucketed = Scorer.featurize(cands, entities, accounts, repos, accEmb,
        entEmb, Scorer.bucketedEntJoin(spark, 8, "graft_spec_feat"))
      .collect().map(r => key(r) -> r.toSeq).toMap
    assert(bucketed.keySet == base.keySet)
    // bit-identical features: the join strategy must not change any value
    bucketed.foreach { case (k, v) => assert(v == base(k), s"mismatch at $k") }
  }
}
