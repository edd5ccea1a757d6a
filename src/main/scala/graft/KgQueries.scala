package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Query registry for the KG-construction pipeline stages. These run on the
  * deterministically synthesized corpus (BASELINE.json input_hint shape);
  * Verify materializes the synthesized inputs (and the frozen scored-pair
  * frame) to parquet so KgOracle's DuckDB SQL can replay each stage
  * cross-engine, and KgPipelineSpec additionally gates the whole pipeline
  * by exact-triple-set comparison against the scalar oracle
  * (ScalarOracle.scala).
  *
  * The synthesis scale follows the driver's sf dir so bench reflects a
  * bigger corpus than verify. One Pipeline.compute Result is MEMOIZED per
  * (session, sf dir): kg_triples / kg_evaluation / kg_dictionary /
  * kg_candidates all reuse the same persisted intermediates instead of
  * re-running corpus→dictionary→scoring per query (the round-1 bench paid
  * that full chain twice).
  */
object KgQueries {

  private type Q = (SparkSession, String) => DataFrame

  def scaleFor(dir: String): CorpusGen.Scale =
    if (dir.contains("sf0.1")) CorpusGen.benchAt(300000) // 300k files / 15k entities
    else if (dir.contains("sf0.01")) CorpusGen.Small
    else CorpusGen.Tiny

  // Keyed by the session OBJECT so a fresh session never sees a Result
  // bound to a stopped one. Weak keying can NOT reclaim entries — the
  // Result's DataFrames strongly reference their SparkSession (the key)
  // through their QueryExecution — so the map is bounded EXPLICITLY:
  //   - access-order LRU capped at `MaxSessions`: an app that churns
  //     newSession() per sweep (the Tune/Scaling pattern) evicts (and
  //     unpersists) the eldest session's entry instead of accumulating
  //     until application end;
  //   - ONE shared listener per SparkContext (not one per session) drains
  //     the whole memo at application end;
  //   - `evict(session)` releases a session's entry the moment a caller is
  //     done with it.
  private val MaxSessions = 4
  private type SessionMemo =
    scala.collection.concurrent.TrieMap[String, Pipeline.Result]
  private val memo =
    new java.util.LinkedHashMap[SparkSession, SessionMemo](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, SessionMemo]): Boolean =
        if (size > MaxSessions) { e.getValue.values.foreach(_.unpersist()); true }
        else false
    }
  private val drainRegistered =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]()

  /** Number of sessions currently memoized (spec surface for the bound). */
  def memoSessionCount: Int = memo.synchronized(memo.size)

  /** Drop (and unpersist) a session's memoized pipeline results. */
  def evict(s: SparkSession): Unit = memo.synchronized {
    val gone = memo.remove(s)
    if (gone != null) gone.values.foreach(_.unpersist())
  }

  /** One pipeline run per (session, scale) — all kg_* queries share it. */
  def result(s: SparkSession, dir: String): Pipeline.Result = {
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Pipeline.Result]
        memo.put(s, m)
        val sc = s.sparkContext
        if (drainRegistered.get(sc) == null) {
          drainRegistered.put(sc, java.lang.Boolean.TRUE)
          sc.addSparkListener(
            new org.apache.spark.scheduler.SparkListener {
              override def onApplicationEnd(
                  end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
                memo.synchronized {
                  val it = memo.values.iterator
                  while (it.hasNext) { it.next().values.foreach(_.unpersist()); }
                  memo.clear()
                }
            })
        }
      }
      m
    }
    perSession.getOrElseUpdate(scaleFor(dir).name,
      Pipeline.computeForScale(s, scaleFor(dir)))
  }

  /** Corpus + the north-rule per-row invariant: sha2(content) computed by
    * Spark from the in-memory synthesis, recomputed by DuckDB over the
    * materialized parquet — cross-engine hash equality per row.
    */
  val corpus: Q = (s, dir) =>
    CorpusGen.repos(s, scaleFor(dir)).toDF()
      .withColumn("content_sha", sha2(col("content"), 256))

  val mentions: Q = (s, dir) =>
    Mentions.extract(CorpusGen.repos(s, scaleFor(dir)).toDF())

  val dictionary: Q = (s, dir) => result(s, dir).dictionary

  /** rank cast to long for the cross-engine compare (DuckDB row_number
    * yields BIGINT).
    */
  val candidates: Q = (s, dir) => result(s, dir).candidates
    .select(col("entity_id"), col("account_id"), col("freq"),
      col("rank").cast("long").as("rank"))

  val triples: Q = (s, dir) => result(s, dir).triples

  /** P/R/F1 rounded to 6 decimals for the cross-engine compare (the spec
    * surfaces use Scorer.evaluate's exact doubles).
    */
  val evaluation: Q = (s, dir) =>
    Scorer.evaluate(result(s, dir).alignments,
        CorpusGen.gold(s, scaleFor(dir)).toDF())
      .select(col("tp"), col("fp"), col("fn"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"))

  /** A4+A5 on the kg corpus itself: normalized co-mention edges. */
  val socialGraph: Q = (s, dir) => {
    val scale = scaleFor(dir)
    Features.socialEdges(CorpusGen.repos(s, scale).toDF(),
        CorpusGen.accounts(s, scale).toDF())
      .select(col("src"), col("dst"), col("freq"), round(col("w"), 6).as("w"))
      .orderBy(col("src"), col("dst"))
  }

  /** Decision-grid sweep (PrepareTrainingSet.java:936-1039): P/R/F1 at
    * every (minScore, margin) point, one DataFrame job.
    */
  val gridEval: Q = (s, dir) =>
    Scorer.gridEvaluation(result(s, dir).alignments,
        CorpusGen.gold(s, scaleFor(dir)).toDF(), s)
      .orderBy(col("min_score"), col("margin"))

  /** The exact (non-fuzzy) candidate path — expansion, rollup, back-off,
    * top-K — as its own DuckDB-oracled surface; the fuzzy LSH tail stays
    * gated by the scalar-oracle specs (KgPipelineSpec).
    */
  val candidatesExact: Q = (s, dir) =>
    CandidateGen.candidates(s, CorpusGen.entities(s, scaleFor(dir)).toDF(),
        result(s, dir).dictionary, KgConf(fuzzyEnabled = false))
      .select(col("entity_id"), col("account_id"), col("freq"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("entity_id"), col("account_id"))

  /** A13 candidate-distribution diagnostics (index loss / cutoff loss /
    * per-rank gold histogram).
    */
  val candidateStats: Q = (s, dir) => {
    val scale = scaleFor(dir)
    val r = result(s, dir)
    Scorer.candidateStats(r.rollup, r.candidates,
        CorpusGen.gold(s, scale).toDF())
      .orderBy(col("stat"), col("ord"))
  }

  def all: Map[String, Q] = Map(
    "kg_corpus" -> corpus,
    "kg_mentions" -> mentions,
    "kg_dictionary" -> dictionary,
    "kg_candidates" -> candidates,
    "kg_candidates_exact" -> candidatesExact,
    "kg_triples" -> triples,
    "kg_evaluation" -> evaluation,
    "kg_social_graph" -> socialGraph,
    "kg_grid_eval" -> gridEval,
    "kg_candidate_stats" -> candidateStats,
  )

  /** DuckDB replays over the parquet frames Verify materializes (KgOracle):
    * corpus/mentions/dictionary/social-graph/exact-candidates recomputed
    * from the PRIMARY inputs, and evaluation/grid/diagnostics/CC+triples
    * replayed from the frozen scored-pair frame. The per-pair feature math
    * itself (and the fuzzy candidate tail) stays gated by the
    * exact-triple-set scalar-oracle specs (KgPipelineSpec).
    */
  def oracles: Map[String, String] = KgOracle.oracles
}
