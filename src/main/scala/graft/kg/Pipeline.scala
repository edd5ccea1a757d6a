package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end orchestration of the KG-construction pipeline:
  *
  *   corpus (repo,path,commit,lang,content)
  *     → scan            (THE one corpus read: mentions + authors +
  *                        co-mention pairs + token counts + sha256, Scan.scala)
  *     → dictionary      (name→account freq)          [shuffle 1: groupBy]
  *     → candidates      (broadcast join + top-K)     [shuffle 2: rollup+window]
  *     → alignments      (features + logistic score + margin argmax)
  *     → representatives (connected components)
  *     → triples         (8-pattern materialization, pred-partitioned)
  *     → lineage         (sha256(content) set, per-partition metrics)
  *
  * Two run modes:
  *   - `triplesForScale` — all in memory, used by SparkEntry.entry and tests.
  *   - `run(root)`       — every stage materialized + checkpointed; re-runs
  *                         resume from the first incomplete stage (north rule).
  */
object Pipeline {

  final case class Result(
      triples: DataFrame,
      alignments: DataFrame,
      lineage: DataFrame,
      mentions: DataFrame,
      dictionary: DataFrame,
      candidates: DataFrame,
      rollupThunk: () => DataFrame,
      scan: DataFrame,
      scanPath: Option[String] = None) {
    /** The pre-top-K candidate rollup (CandidateGen.rollupAll) — the frame
      * the A13 diagnostics need. A thunk + lazy val because building the
      * rollup plan runs an eager probe job (the fuzzy-skip check): compute()
      * passes the frame it already built for candidates, run() defers the
      * build until a caller actually asks for diagnostics.
      *
      * Lifetime: like every other frame on this Result, `rollup` must not
      * be touched after [[unpersist]] — in compute() mode its plan reads
      * the persisted dictionary and the scan scratch parquet, both of
      * which unpersist() releases/deletes (KgQueries' LRU eviction calls
      * it), so a post-eviction access recomputes through deleted scratch
      * and can fail (ADVICE r5).
      */
    lazy val rollup: DataFrame = rollupThunk()
    /** Release the frames compute() persisted (and the scan's scratch
      * parquet) — a long-lived session running many pipelines accumulates
      * cache otherwise (storage eviction then fights execution memory).
      */
    def unpersist(): Unit = {
      alignments.unpersist()
      dictionary.unpersist()
      candidates.unpersist() // no-op on run()'s checkpoint-backed frame
      scanPath.foreach(Scan.dropScratch(alignments.sparkSession, _))
    }
  }

  def sessionConf(spark: SparkSession): Unit = {
    // AQE handles runtime coalescing + skew-join splitting (SURVEY §2.9 X4)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }

  def compute(spark: SparkSession, repos: DataFrame, entities: DataFrame,
      accounts: DataFrame, accountEmbeddings: DataFrame,
      entityEmbeddings: DataFrame, conf: KgConf = KgConf()): Result = {
    sessionConf(spark)
    // ONE corpus read: Scan.products extracts mentions + authors +
    // co-mention pairs + token counts in a single pass and is the only
    // frame that ever sees `content`. It feeds four consumers (dictionary,
    // lineage, text vectors, social graph) — materialized as scratch
    // PARQUET (not .persist) so each consumer reads only its pruned
    // columns; the product rows are a small fraction of content size
    // (annotations + per-authored-file token histograms).
    val scanPath = Scan.scratchDir(spark)
    val scan = Scan.materialize(Scan.products(repos), scanPath)
    val mentions = Scan.mentions(scan)
    val dict = Dictionary.build(spark, mentions, accounts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the dim-side feature frames (accVec/sgVec/hp lookup) and the
    // dictionary→candidates chain are independent, but each blocks the
    // driver on an eager job (textVectors' localCheckpoint vs the
    // candidate-ladder probe) — build the dims on a Future so the two
    // chains' jobs interleave instead of running back-to-back (the same
    // overlap the two bucketed table writes use in Scorer.bucketedEntJoin)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val dimsF = Future {
      Scorer.dims(entities, accounts, scan, accountEmbeddings, entityEmbeddings)
    }
    // the pre-top-K rollup is exposed on Result so the A13 diagnostics
    // (Scorer.candidateStats) read the SAME checkpointed frame instead of
    // re-running the dictionary join + ladder — at corpus scale that
    // recompute is a full dictionary-sized join paid once per diagnostic
    val rollup = CandidateGen.rollupAll(spark, entities, dict, conf)
    // persisted (lazily — the scoring chain's first pass fills it): the
    // candidates frame is consumed by the scorer AND re-read by every
    // kg_candidates / A13-diagnostics access; without the persist each
    // access re-runs the top-K window over the rollup checkpoint. Size is
    // O(|entities| × topK) narrow rows, tiny next to the corpus.
    val cands = CandidateGen.topK(rollup, conf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // alignments feed three consumers (connected components, the triple
    // materialization, and the evaluation surface) — without a persist the
    // whole corpus-scan → dictionary → scoring chain recomputes per
    // consumer (~3× wall). Persisted size is O(|entities| × topK), tiny
    // next to the corpus.
    val aligned = Scorer.score(cands, entities, accounts, scan,
        accountEmbeddings, entityEmbeddings, conf,
        prebuiltDims = Some(Await.result(dimsF, Duration.Inf)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fill the cache with ONE job before the consumers fan out: the final
    // triple plan scans `aligned` six times (per-pair branch, the two
    // narrow distincts, and representatives' three edge/label scans), and
    // under AQE those scans submit as CONCURRENT stage jobs — against an
    // unfilled cache each one re-runs the whole bucketed-join → featurize →
    // window chain (measured: a wave of six equal ~34 s jobs at 2M files/
    // local[16], ~6× the chain's CPU). One eager count computes the chain
    // once; the fan-out then reads cached blocks.
    aligned.count()
    val reps = Canonicalize.representatives(spark, aligned, conf)
    val triples = Triples.materialize(aligned, reps)
    val lineage = scan
      .select(col("repo"), col("path"), col("commit"), col("content_sha"))
      .distinct()
    Result(triples, aligned, lineage, mentions, dict, cands, () => rollup,
      scan, Some(scanPath))
  }

  /** Auto-select the featurize pair-join strategy by scale: corpora at or
    * above `featurizeAutoBucketFiles` files get bucketed entity_id tables
    * (no serial broadcast build of a dim that grows with the corpus —
    * measured 1.9× faster at 2M files/local[16]); the bucketed tables are
    * named per SCALE so concurrent scales in one session never alias, and
    * same-scale overwrites rewrite identical bytes (deterministic
    * synthesis). Explicitly-set bucketedFeaturize is left alone.
    */
  def confFor(scale: CorpusGen.Scale, conf: KgConf = KgConf()): KgConf =
    if (!conf.bucketedFeaturize && scale.nFiles >= conf.featurizeAutoBucketFiles)
      conf.copy(bucketedFeaturize = true,
        featurizePrefix = s"graft_feat_${scale.name}")
    else conf

  /** Convenience: compute() over a fully synthesized world at `scale`. */
  def computeForScale(spark: SparkSession, scale: CorpusGen.Scale,
      conf0: KgConf = KgConf()): Result = {
    val conf = confFor(scale, conf0)
    compute(spark,
      CorpusGen.repos(spark, scale).toDF(),
      CorpusGen.entities(spark, scale).toDF(),
      CorpusGen.accounts(spark, scale).toDF(),
      CorpusGen.accountEmbeddings(spark, scale).toDF(),
      CorpusGen.entityEmbeddings(spark, scale).toDF(), conf)
  }

  def triplesForScale(spark: SparkSession, scale: CorpusGen.Scale,
      conf: KgConf = KgConf()): DataFrame =
    computeForScale(spark, scale, conf).triples

  /** Materialized, checkpointed, resumable run. Every stage is skipped when
    * its `_SUCCESS` marker exists, so a killed run resumes where it stopped
    * and produces byte-identical outputs (deterministic inputs + explicit
    * total-order tie-breaks everywhere).
    */
  def run(spark: SparkSession, scale: CorpusGen.Scale, root: String,
      conf0: KgConf = KgConf()): Result = {
    sessionConf(spark)
    val conf = confFor(scale, conf0)
    // params fingerprint: a resumed root with a different scale or KgConf
    // recomputes instead of silently reusing stale stage outputs
    val params = s"$scale|$conf"
    val repos = Checkpoint.stage(spark, root, "corpus", params = params) {
      CorpusGen.repos(spark, scale).toDF()
    }
    val entities = Checkpoint.stage(spark, root, "entities", params = params) {
      CorpusGen.entities(spark, scale).toDF()
    }
    val accounts = Checkpoint.stage(spark, root, "accounts", params = params) {
      CorpusGen.accounts(spark, scale).toDF()
    }
    // the single corpus read, checkpointed: a resumed run never touches
    // content again — every later stage derives from the scan parquet
    val scan = Checkpoint.stage(spark, root, "scan", params = params) {
      Scan.products(repos)
    }
    val mentions = Scan.mentions(scan)
    val dict = Checkpoint.stage(spark, root, "dictionary", params = params) {
      Dictionary.build(spark, mentions, accounts)
    }
    val accEmb = Checkpoint.stage(spark, root, "account_embeddings", params = params) {
      CorpusGen.accountEmbeddings(spark, scale).toDF()
    }
    val entEmb = Checkpoint.stage(spark, root, "entity_embeddings", params = params) {
      CorpusGen.entityEmbeddings(spark, scale).toDF()
    }
    val cands = Checkpoint.stage(spark, root, "candidates", params = params) {
      CandidateGen.candidates(spark, entities, dict, conf)
    }
    val aligned = Checkpoint.stage(spark, root, "alignments", params = params) {
      Scorer.score(cands, entities, accounts, scan, accEmb, entEmb, conf)
    }
    val reps = Checkpoint.stage(spark, root, "representatives", params = params) {
      Canonicalize.representatives(spark, aligned, conf)
    }
    val triples = Checkpoint.stage(spark, root, "triples", Seq("pred"), params) {
      Triples.materialize(aligned, reps)
    }
    val lineage = Checkpoint.stage(spark, root, "lineage", params = params) {
      scan.select(col("repo"), col("path"), col("commit"), col("content_sha"))
        .distinct()
    }
    Result(triples, aligned, lineage, mentions, dict, cands,
      () => CandidateGen.rollupAll(spark, entities, dict, conf), scan)
  }
}
