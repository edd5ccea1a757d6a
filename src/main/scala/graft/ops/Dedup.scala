package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, over a
  * documents(doc_id, text, …) table.
  *
  * All variants follow the same scale shape: cheap per-row signature →
  * bucket by signature (band) → candidate pairs ONLY within buckets →
  * exact verification on the candidates. No all-pairs joins anywhere; the
  * only shuffles are the bucket groupBys, and signatures are built from
  * codegen'd built-ins (split/transform/aggregate/xxhash64), not UDFs —
  * except SimHash, whose 64-lane bit loop is one scalar UDF.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by full-content hash: keep the min doc_id per sha256 group.
    * At 100 TB this is the standard first pass: shuffle carries (sha, id)
    * pairs only, never content.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(sha2(col("text"), 256).as("sha"), col("doc_id"))
      .groupBy(col("sha"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- minhash

  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** k-token shingles via built-ins: slice a token array at every offset. */
  def shinglesCol(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", slice(tokens, i + 1, lit(k)))))

  /** One minhash lane: min over shingles of a seeded 64-bit hash. */
  private def minhashLane(shingles: Column, lane: Int): Column =
    array_min(transform(shingles, s => xxhash64(lit(lane), s)))

  /** signatures(doc_id, band_id, band_hash): H minhash lanes split into
    * `bands` bands of H/bands rows each (standard MinHash+LSH banding).
    */
  def minhashBands(docs: DataFrame, shingleK: Int = 3, lanes: Int = 16,
      bands: Int = 4): DataFrame = {
    val sh = shinglesCol(tokensCol(col("text")), shingleK)
    val withSig = docs.select(col("doc_id"), sh.as("shingles"))
      .withColumn("sig", array((0 until lanes).map(i => minhashLane(col("shingles"), i)): _*))
    val rows = lanes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        xxhash64(slice(col("sig"), b * rows + 1, rows)).as("band_hash"))
    }
    withSig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
  }

  /** Candidate pairs from shared bands, verified with exact token-set
    * Jaccard ≥ threshold. Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    */
  def minhashNearDups(docs: DataFrame, shingleK: Int = 3, lanes: Int = 16,
      bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    val sigs = minhashBands(docs, shingleK, lanes, bands)
    val pairs = sigs.alias("l")
      .join(sigs.alias("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sets = docs.select(col("doc_id"),
      array_distinct(shinglesCol(tokensCol(col("text")), shingleK)).as("sset"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("set_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("set_b")), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over tokens (weighted bit-vote). Scalar core shared
    * with tests; splitmix64 of the token's FNV-1a — stable across JVMs.
    */
  def simhashScalar(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    if (tokens != null) tokens.foreach { t =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h = graft.kg.CorpusGen.mix(h)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf((tokens: Seq[String]) => simhashScalar(tokens))

  /** Near-dups by SimHash: band the 64 bits into 4×16-bit keys (any pair
    * within Hamming distance 3 shares ≥1 exact band), verify with
    * bit_count(xor) ≤ maxHamming. Returns (doc_a, doc_b, hamming).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val withSim = docs
      .select(col("doc_id"), simhashUdf(tokensCol(col("text"))).as("sim"))
    val banded = withSim.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_key"))): _*))
        .as("b"))
      .select(col("doc_id"), col("sim"), col("b.band_id"), col("b.band_key"))
    banded.alias("l").join(banded.alias("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_key") === col("r.band_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------------- ngram

  /** Character-n-gram Jaccard near-dup. Candidate blocking is BANDED
    * minhash over the gram set (lanes/bands as in minhashNearDups): a
    * band key combines `lanes/bands` minhashes, so buckets stay selective
    * even on a degenerate corpus with a tiny gram universe, where single-
    * lane or length-bucket blocking degenerates to O(N²) within-bucket
    * pairs (measured: length buckets 215 s, 1-lane minhash 490 s, banded
    * ~2 s on 5k docs at sf0.1). A pair at Jaccard j collides in ≥1 of 4
    * 4-lane bands with prob 1-(1-j⁴)⁴ ≈ 0.88 at j=0.8, ≈0.997 at j=0.9.
    * Exact Jaccard verifies every candidate.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 4, threshold: Double = 0.8,
      lanes: Int = 16, bands: Int = 4): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    // dynamic-start substring needs the SQL form; still pure built-ins
    val withGrams = docs.withColumn("norm", norm)
      .withColumn("grams", array_distinct(
        expr(s"CASE WHEN length(norm) < $n THEN array(norm) " +
          s"ELSE transform(sequence(1, length(norm) - ${n - 1}), i -> substring(norm, i, $n)) END")))
      .select(col("doc_id"), col("grams"))
    val rows = lanes / bands
    val withSig = withGrams.withColumn("sig",
      array((0 until lanes).map(l =>
        array_min(transform(col("grams"), g => xxhash64(lit(l), g)))): _*))
    val keyed = withSig.select(col("doc_id"), col("grams"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band_id"),
          xxhash64(slice(col("sig"), b * rows + 1, rows)).as("band_hash"))): _*))
        .as("k"))
      .select(col("doc_id"), col("grams"), col("k.band_id"), col("k.band_hash"))
    keyed.alias("l").join(keyed.alias("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.grams").as("grams_a"), col("r.grams").as("grams_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------------------------------------------------------------- embedding

  /** Embedding-cosine near-dup over embeddings(vec_id, embedding): standard
    * multi-table random-hyperplane LSH — `tables` independent hash tables of
    * `planes` sign bits each; a pair is a candidate if it collides in ANY
    * table (OR-amplification lifts recall at moderate cosine); candidates
    * verified exactly with zip_with/aggregate cosine ≥ threshold.
    *
    * At scale: each vector emits `tables` (table_id, bits) keys; the only
    * shuffle is the bucket self-join, whose fan-out is controlled by
    * `planes` (bigger = smaller buckets).
    */
  def embeddingNearDups(embs: DataFrame, dim: Int = 64, planes: Int = 4,
      tables: Int = 8, threshold: Double = 0.35): DataFrame = {
    def bucketBits(tbl: Int): Column =
      (0 until planes).map { p =>
        val dot = aggregate(
          zip_with(col("embedding"), planeCol(tbl * planes + p, dim),
            (x, h) => x.cast("double") * h),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce((a, b) => a + b)
    val keyed = embs.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(tb =>
        struct(lit(tb).as("table_id"), bucketBits(tb).as("bits"))): _*)).as("b"))
      .select(col("vec_id"), col("embedding"), col("b.table_id"), col("b.bits"))
    keyed.alias("l").join(keyed.alias("r"),
        col("l.table_id") === col("r.table_id") && col("l.bits") === col("r.bits") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        col("l.embedding").as("emb_a"), col("r.embedding").as("emb_b"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("cos", Similarity.cosineCol(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }

  /** Fixed pseudo-random hyperplane as an array literal column. */
  def planeCol(p: Int, dim: Int): Column =
    array((0 until dim).map { j =>
      val h = graft.kg.CorpusGen.mix(0x51ab5ea1L * (p + 1) + j)
      lit(((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)
    }: _*)
}
