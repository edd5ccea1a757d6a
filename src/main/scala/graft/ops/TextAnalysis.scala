package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over
  * documents(doc_id, text, lang, …). Everything except the rolling-hash
  * fingerprint is pure built-in Columns (codegen'd, pushdown-friendly).
  */
object TextAnalysis {

  // ------------------------------------------------------------ language id

  /** Tiny per-language stopword profiles (n-gram heuristic class). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "con", "por", "del"))

  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}0-9]+"), t => t =!= "")

  /** Per-language stopword hit count over the token array. */
  def hitCount(tokens: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens),
      array(stopwords(lang).map(lit): _*)))

  /** Detected language = argmax of stopword hits; ties break alphabetically
    * first; zero hits everywhere → "unknown". Explicit CASE chain so the
    * DuckDB oracle can mirror it exactly.
    */
  def langIdCol(text: Column): Column = {
    val toks = array_distinct(tokensCol(text))
    val langs = stopwords.keys.toSeq.sorted // de, en, es, fr
    val hits = langs.map(l => l -> hitCount(toks, l)).toMap
    val allZero = langs.map(hits).reduce((a, b) => a + b) === 0
    // first lang (alphabetical order) whose hits >= all others wins the tie
    val winner = langs.foldRight(lit("unknown")) { case (l, els) =>
      val cond = langs.filter(_ != l).map(e => hits(l) >= hits(e))
        .reduce((a, b) => a && b)
      when(cond, lit(l)).otherwise(els)
    }
    when(allZero, lit("unknown")).otherwise(winner)
  }

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langIdCol(col("text")).as("lang_detected"))

  // ------------------------------------------------------------ quality

  /** Quality scoring: length, token stats, punctuation/uppercase/digit
    * ratios, stopword ratio — the standard pre-training quality gates.
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val nChars = length(col("text"))
    val nTokens = size(toks)
    val punct = nChars - length(regexp_replace(col("text"), "[\\.,;:!\\?]", ""))
    val digits = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val upper = nChars - length(regexp_replace(col("text"), "[A-Z]", ""))
    val enHits = hitCount(toks, "en")
    docs.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)), 4).as("avg_token_len"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 4).as("punct_ratio"),
      round(digits.cast("double") / greatest(nChars, lit(1)), 4).as("digit_ratio"),
      round(upper.cast("double") / greatest(nChars, lit(1)), 4).as("upper_ratio"),
      round(enHits.cast("double") / lit(10.0), 4).as("stopword_cov"))
  }

  // ------------------------------------------------------------ tokens

  /** Token counting: whitespace words + a BPE-ish subword estimate (each
    * letters/digits run counts ceil(len/4) subwords — a cheap proxy for
    * byte-pair tokenizers).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val wsTokens = size(filter(split(col("text"), "\\s+"), t => t =!= ""))
    val bpeIsh = aggregate(tokensCol(col("text")), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))
    docs.select(col("doc_id"), wsTokens.cast("long").as("n_ws_tokens"),
      bpeIsh.as("n_bpe_est"))
  }

  // ------------------------------------------------------------ fingerprint

  /** Rolling polynomial hash (Rabin-Karp form) of the whitespace-normalized
    * text — an order-sensitive document fingerprint. Scalar UDF (shared with
    * nothing — the stateful 64-bit roll isn't expressible as Columns).
    */
  val fingerprintUdf = udf((text: String) => {
    val s = graft.kg.Text.normalizeWs(if (text == null) "" else text).toLowerCase
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1315423911L + s.charAt(i); i += 1 }
    h
  })

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintUdf(col("text")).as("fingerprint"))
}
