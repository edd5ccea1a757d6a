package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Query registry for the training-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal) over documents/embeddings.
  */
object OpsQueries {

  private type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)

  // ---------------------------------------------------------------- dedup

  val dedupExact: Q = (s, dir) =>
    Dedup.exact(docs(s, dir)).orderBy(col("sha"))

  val dedupExactSql: String =
    """SELECT sha256(text) AS sha, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY sha ORDER BY sha""".stripMargin

  val dedupMinhash: Q = (s, dir) =>
    Dedup.minhashNearDups(docs(s, dir)).orderBy(col("doc_a"), col("doc_b"))

  val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashNearDups(docs(s, dir)).orderBy(col("doc_a"), col("doc_b"))

  val dedupNgram: Q = (s, dir) =>
    Dedup.ngramJaccard(docs(s, dir)).orderBy(col("doc_a"), col("doc_b"))

  val dedupEmbedding: Q = (s, dir) =>
    Dedup.embeddingNearDups(embs(s, dir)).orderBy(col("vec_a"), col("vec_b"))

  // ---------------------------------------------------------------- ANN

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding"))

  val annBruteTopk: Q = (s, dir) => {
    val e = embs(s, dir)
    Similarity.bruteForceTopK(e, queriesOf(e), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** DuckDB's list_cosine_similarity verifies the exact top-k path. */
  val annBruteTopkSql: String =
    """SELECT query_id, vec_id, CAST(round(cos, 4) AS DOUBLE) AS cos, rnk FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |    list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id ASC) AS rnk
      |  FROM embeddings q, embeddings c WHERE q.vec_id < 5)
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  val annIvfTopk: Q = (s, dir) => {
    val e = embs(s, dir)
    Similarity.ivfTopK(e, queriesOf(e), k = 10, nCells = 16, nProbe = 4, dim = 64)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---------------------------------------------------------------- text

  val textLangid: Q = (s, dir) =>
    TextAnalysis.langId(docs(s, dir)).orderBy(col("doc_id"))

  val textQuality: Q = (s, dir) =>
    TextAnalysis.quality(docs(s, dir)).orderBy(col("doc_id"))

  val textQualitySql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
      |  round(length(text)::DOUBLE / greatest(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')), 1), 4) AS avg_token_len,
      |  round((length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')))::DOUBLE / greatest(length(text), 1), 4) AS punct_ratio,
      |  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / greatest(length(text), 1), 4) AS digit_ratio,
      |  round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE / greatest(length(text), 1), 4) AS upper_ratio,
      |  round(len(list_intersect(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')), ['the','and','of','to','in','is','that','with','for','was']))::DOUBLE / 10.0, 4) AS stopword_cov
      |FROM documents ORDER BY doc_id""".stripMargin

  val textLangidSql: String = {
    def hits(l: String): String = {
      val words = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(",")
      s"len(list_intersect(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}0-9]+'), x -> x <> '')), [$words]))"
    }
    s"""SELECT doc_id, CASE
       |  WHEN ${hits("de")} = 0 AND ${hits("en")} = 0 AND ${hits("es")} = 0 AND ${hits("fr")} = 0 THEN 'unknown'
       |  WHEN ${hits("de")} >= ${hits("en")} AND ${hits("de")} >= ${hits("es")} AND ${hits("de")} >= ${hits("fr")} THEN 'de'
       |  WHEN ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("es")} AND ${hits("en")} >= ${hits("fr")} THEN 'en'
       |  WHEN ${hits("es")} >= ${hits("de")} AND ${hits("es")} >= ${hits("en")} AND ${hits("es")} >= ${hits("fr")} THEN 'es'
       |  ELSE 'fr' END AS lang_detected
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val textTokens: Q = (s, dir) =>
    TextAnalysis.tokenCounts(docs(s, dir)).orderBy(col("doc_id"))

  val textTokensSql: String =
    """SELECT doc_id,
      |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_ws_tokens,
      |  CAST(coalesce(list_sum(list_transform(
      |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}0-9]+'), x -> x <> ''),
      |    x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  val textFingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprints(docs(s, dir)).orderBy(col("doc_id"))

  private val tokensSqlExpr =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** F16/F17: TF-IDF as explicit joins/aggregates. */
  val textTfidf: Q = (s, dir) =>
    ops.TfIdf.tfidf(docs(s, dir)).orderBy(col("doc_id"), col("token"))

  val textTfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSqlExpr) AS token FROM documents),
       |tf AS (
       |  SELECT doc_id, token, 1.0 + ln(count(*)::DOUBLE) AS tf
       |  FROM toks GROUP BY doc_id, token),
       |dfq AS (
       |  SELECT token, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token),
       |idf AS (
       |  SELECT token, ln(((SELECT count(*) FROM documents)::DOUBLE + 1.0) /
       |    (df::DOUBLE + 1.0)) + 1.0 AS idf FROM dfq)
       |SELECT tf.doc_id AS doc_id, tf.token AS token, round(tf.tf * idf.idf, 4) AS tfidf
       |FROM tf JOIN idf ON tf.token = idf.token
       |ORDER BY tf.doc_id, tf.token""".stripMargin

  /** A14: χ² (token, category) feature-selection scores; category = lang. */
  val textChi2: Q = (s, dir) =>
    ops.TfIdf.chiSquared(docs(s, dir).withColumnRenamed("lang", "category"))
      .orderBy(col("token"), col("category"))

  val textChi2Sql: String =
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, category, token FROM (
       |    SELECT doc_id, lang AS category,
       |      unnest($tokensSqlExpr) AS token FROM documents)),
       |tok_cat AS (
       |  SELECT token, category, count(*) AS n11 FROM toks
       |  GROUP BY token, category HAVING count(*) >= 5),
       |tok_tot AS (SELECT token, count(*) AS n1x FROM toks GROUP BY token),
       |cat_tot AS (SELECT lang AS category, count(*) AS nx1 FROM documents GROUP BY lang),
       |n AS (SELECT count(*)::DOUBLE AS n FROM documents)
       |SELECT tc.token AS token, tc.category AS category, tc.n11 AS n11,
       |  round(n.n * pow(tc.n11 * (n.n - tt.n1x - (ct.nx1 - tc.n11)) - (tt.n1x - tc.n11) * (ct.nx1 - tc.n11), 2) /
       |    (tt.n1x * (n.n - tt.n1x) * ct.nx1 * (n.n - ct.nx1)), 4) AS chi2
       |FROM tok_cat tc
       |JOIN tok_tot tt ON tc.token = tt.token
       |JOIN cat_tot ct ON tc.category = ct.category, n
       |ORDER BY tc.token, tc.category""".stripMargin

  // ---------------------------------------------------------------- cooc

  /** A8/W4/W5: token dictionary with dense rank ids. */
  val coocDictionary: Q = (s, dir) =>
    ops.Cooccurrence.tokenDictionary(docs(s, dir), minFreq = 5, topV = 200)
      .withColumn("id", col("id").cast("long"))
      .orderBy(col("id"))

  val coocDictionarySql: String =
    """SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token ASC) - 1 AS id
      |FROM (SELECT token, count(*) AS freq
      |      FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
      |            FROM documents)
      |      GROUP BY token HAVING count(*) > 5
      |      ORDER BY freq DESC, token ASC LIMIT 200)
      |ORDER BY id""".stripMargin

  /** A9/X1: windowed co-occurrence pair weights with shard columns. */
  val coocPairs: Q = (s, dir) => {
    val d = docs(s, dir)
    val dict = ops.Cooccurrence.tokenDictionary(d, minFreq = 5, topV = 200)
    ops.Cooccurrence.cooccurrence(d, dict).orderBy(col("l"), col("r"))
  }

  /** A10: dense marginals over the dictionary id space. */
  val coocMarginals: Q = (s, dir) => {
    val d = docs(s, dir)
    val dict = ops.Cooccurrence.tokenDictionary(d, minFreq = 5, topV = 200)
    val cooc = ops.Cooccurrence.cooccurrence(d, dict)
    ops.Cooccurrence.marginals(s, cooc, 200).orderBy(col("id"))
  }

  // ---------------------------------------------------------------- media

  val multimodalFeatures: Q = (s, dir) =>
    Multimodal.featureStats(s, docs(s, dir))

  // ---------------------------------------------------------------- registry

  def all: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash_lsh" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_ngram_jaccard" -> dedupNgram,
    "dedup_embedding_cosine" -> dedupEmbedding,
    "ann_brute_topk" -> annBruteTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "text_langid" -> textLangid,
    "text_quality" -> textQuality,
    "text_tokens" -> textTokens,
    "text_fingerprint" -> textFingerprint,
    "text_tfidf" -> textTfidf,
    "text_chi2" -> textChi2,
    "cooc_dictionary" -> coocDictionary,
    "cooc_pairs" -> coocPairs,
    "cooc_marginals" -> coocMarginals,
    "multimodal_features" -> multimodalFeatures,
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "ann_brute_topk" -> annBruteTopkSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_tokens" -> textTokensSql,
    "text_tfidf" -> textTfidfSql,
    "text_chi2" -> textChi2Sql,
    "cooc_dictionary" -> coocDictionarySql,
  )
}
