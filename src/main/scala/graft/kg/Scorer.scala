package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage 4: feature generation + logistic scoring + argmax-with-margin
  * selection.
  *
  * Features (north_star: "name similarity, context cosine, popularity
  * prior" replacing the reference's NN):
  *   - name_sim     mean Jaro-Winkler over entity names (NameScorer.java:42-53)
  *   - context_cos  TF-cosine(entity abstract, account description)
  *                  (CosineScorer.java:20-38)
  *   - log_followers / log_freq (FollowersScorer.java:11-18 log scaling)
  *   - verified     (VerifiedScorer.java:11-14)
  *
  * score = sigmoid(w·x + b) as Column arithmetic (codegen'd); only the two
  * string-similarity features are Scala UDFs (shared bit-for-bit with the
  * scalar oracle in ScalarOracle.scala).
  *
  * Selection (W3, PrepareTrainingSet.java:904-926): per entity the argmax
  * wins only if (best − second) > margin AND best > minScore.
  *
  * Scale notes: candidates ⋈ entities is broadcast on the entity dim;
  * candidates ⋈ accounts joins on account_id — at 10^12-file scale the
  * accounts dim may exceed broadcast size, so that join stays a shuffle
  * hash join on a key whose cardinality is bounded by topK × |entities|.
  */
object Scorer {

  /** F20 (ISWC17Strategy.java:86-92): append all C(n,2) pairwise products
    * of the base feature columns — generated Column exprs, no UDF.
    */
  def withCrossProducts(df: DataFrame, featureCols: Seq[String]): DataFrame =
    featureCols.combinations(2).foldLeft(df) { case (d, Seq(a, b)) =>
      d.withColumn(s"${a}_x_$b", col(a) * col(b))
    }

  val nameSimUdf = udf((names: Seq[String], cand: String) =>
    Text.nameSimilarity(names, cand))

  val cosUdf = udf((a: String, b: String) =>
    Text.cosineTokens(Text.tokens(a), Text.tokens(b)))

  /** alignments(entity_id, account_id, freq, rank, score, is_alignment) —
    * rank recomputed by (score desc, account_id asc).
    */
  def score(candidates: DataFrame, entities: DataFrame, accounts: DataFrame,
      conf: KgConf = KgConf()): DataFrame = {
    val ent = entities.select(col("id").as("entity_id"), col("names"),
      col("abstractText"))
    val acc = accounts.select(col("accountId").as("account_id"),
      col("screenName").as("screen_name"), col("name").as("account_name"),
      col("description"), col("followers"), col("verified"))

    val joined = candidates
      .join(broadcast(ent), Seq("entity_id"))
      .join(acc, Seq("account_id"))

    val z =
      lit(conf.wName) * nameSimUdf(col("names"), col("account_name")) +
      lit(conf.wCos) * cosUdf(col("abstractText"), col("description")) +
      lit(conf.wFollowers) * log(10.0, col("followers").cast("double") + lit(1.0)) +
      lit(conf.wFreq) * log(10.0, col("freq").cast("double") + lit(1.0)) +
      lit(conf.wVerified) * col("verified").cast("double") +
      lit(conf.bias)
    val scored = joined.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))

    val w = Window.partitionBy(col("entity_id"))
      .orderBy(col("score").desc, col("account_id").asc)
    scored
      .withColumn("score_rank", row_number().over(w))
      .withColumn("second_score",
        coalesce(lead(col("score"), 1).over(w), lit(0.0)))
      .withColumn("is_alignment",
        col("score_rank") === 1 &&
          col("score") - col("second_score") > lit(conf.margin) &&
          col("score") > lit(conf.minScore))
      .select(col("entity_id"), col("account_id"), col("screen_name"),
        col("freq"), col("score"), col("score_rank").as("rank"),
        col("is_alignment"))
  }

  /** A12: P/R/F1 vs gold with reference abstain semantics
    * (CustomEvaluation.java:30-53): right pick → TP; wrong pick → FP+FN;
    * abstain on an entity that has a gold account → FN.
    */
  def evaluate(alignments: DataFrame, gold: DataFrame): DataFrame = {
    val picks = alignments.filter(col("is_alignment"))
      .select(col("entity_id"), col("account_id").as("picked"))
    val g = gold.select(col("entity").as("entity_id"),
      col("accountId").as("gold_account"))
    val j = g.join(picks, Seq("entity_id"), "left")
    j.agg(
      sum(when(col("picked") === col("gold_account"), 1).otherwise(0)).as("tp"),
      sum(when(col("picked").isNotNull &&
        (col("gold_account") < 0 || col("picked") =!= col("gold_account")), 1)
        .otherwise(0)).as("fp"),
      sum(when(col("gold_account") >= 0 &&
        (col("picked").isNull || col("picked") =!= col("gold_account")), 1)
        .otherwise(0)).as("fn"))
      .withColumn("precision", col("tp") / greatest(col("tp") + col("fp"), lit(1)))
      .withColumn("recall", col("tp") / greatest(col("tp") + col("fn"), lit(1)))
      .withColumn("f1", lit(2.0) * col("precision") * col("recall") /
        greatest(col("precision") + col("recall"), lit(1e-9)))
  }
}
