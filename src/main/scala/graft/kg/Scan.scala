package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE corpus pass.
  *
  * The pipeline needs four products of the raw content: the annotation
  * rows (mentions), the author list (per-account corpus text), the
  * author×mention pairs (social graph), and the per-file token counts
  * (TF-IDF model). Before this object existed each product scanned the
  * corpus independently — Mentions.extract, Features.authoredContent and
  * Features.coMentionPairsUdf each read every content string, i.e. THREE
  * full corpus reads per pipeline run. At 10^12-file scale the corpus
  * read IS the pipeline's dominant cost, so the pass count is the first
  * thing to fix: `products` extracts all four in a single pass, the
  * pipeline persists/checkpoints the (small) product rows, and every
  * downstream stage derives from them — content is read exactly once and
  * never again.
  *
  * Exactness: each product is extracted by the SAME kernel the dedicated
  * scans used (the three regexes below and the xxhash64 token counter are
  * verbatim from Mentions/Features), so the derived frames are
  * row-identical to the per-scan formulations — KgPipelineSpec's exact
  * triple-set gate and the DuckDB SQL replays hold unchanged.
  *
  * Reference analogue: BuildUserIndex.java:221-269 likewise emits author ∪
  * mention rows from ONE pass over the tweet stream.
  */
object Scan {

  /** ONE regex pass for all three marker products. The historical kernels
    * — Mentions.AnnotationRe `// @(author|mention) (\S+) \(([^)]*)\)` and
    * Features' AuthorRe/MentionRe `// @(author|mention) (\S+)` — share the
    * marker prefix, so a single scan with the display-name group OPTIONAL
    * yields all three match sets: every combined match is an author/mention
    * row, and the matches whose optional group is present are exactly the
    * annotation rows. Equivalent to the three independent scans whenever
    * no marker match overlaps text another scan would match: display names
    * contain no `// @` marker, screens are \w+, and a ` (` after a screen
    * closes before any later marker (see ScanKernelSpec, which property-
    * tests the equivalence and pins each divergence case) — all true of
    * every generator and fixture, and gated by the DuckDB replays and
    * KgPipelineSpec's exact-set check, which re-derive the products
    * independently. Cuts the marker passes over content from 3 to 1
    * (measured ~25% off the UDF kernel on the short synthetic contents;
    * proportionally more on real-size files where the scan IS the cost).
    */
  private val MarkerRe = "// @(author|mention) (\\S+)( \\(([^)]*)\\))?".r

  /** Per-file products. `tok` is populated only for authored files (the
    * only files whose tokens feed the per-account text model) — the token
    * histogram is the widest product, so skipping unauthored files keeps
    * the persisted frame small.
    */
  final case class Products(
      anns: Seq[(String, String, String)],
      authors: Seq[String],
      mens: Seq[String],
      tok: Seq[(Long, Long)])

  /** The scalar kernel behind [[productsUdf]] — exposed so ScanKernelSpec
    * can property-test it against the historical three-regex formulation
    * without a Spark job.
    */
  def productsOf(content: String): Products =
    if (content == null) Products(Nil, Nil, Nil, Nil)
    else {
      val annsB = Seq.newBuilder[(String, String, String)]
      val authorsB = Seq.newBuilder[String]
      val mensB = Seq.newBuilder[String]
      MarkerRe.findAllMatchIn(content).foreach { m =>
        val kind = m.group(1)
        val screen = m.group(2)
        if (m.group(3) != null) annsB += ((kind, screen, m.group(4)))
        if (kind == "author") authorsB += screen else mensB += screen
      }
      val anns = annsB.result()
      val authors = authorsB.result()
      val mens = mensB.result()
      val tok =
        if (authors.isEmpty) Seq.empty[(Long, Long)]
        else {
          // Features.fileTokenCountsUdf kernel: per-file counts over token
          // HASHES — one row per distinct token per file, key already a long
          val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
          Text.tokens(content).foreach { t =>
            val h = graft.ops.Dedup.xxLane(0, t)
            m.update(h, m.getOrElse(h, 0L) + 1L)
          }
          m.toSeq
        }
      Products(anns, authors, mens, tok)
    }

  val productsUdf = udf(productsOf _)

  /** (repo, path, commit, content_sha, anns, authors, mens, tok) — one row
    * per file, content dropped. The sha2 invariant is computed here, at the
    * only place content is ever visible (input_hint contract).
    */
  def products(repos: DataFrame): DataFrame =
    Mentions.withSha(repos)
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        productsUdf(col("content")).as("s"))
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        col("s.anns").as("anns"), col("s.authors").as("authors"),
        col("s.mens").as("mens"), col("s.tok").as("tok"))

  /** Materialize a products frame as scratch PARQUET and return the
    * read-back frame (plus the path, for cleanup).
    *
    * Why not .persist(): the products row is wide (the per-file token
    * histogram dominates), and a columnar-cache read decodes the whole
    * row per consumer — measured at 2M files/local[16] the dictionary
    * build alone took 173 s off the cached frame vs ~27 s off a narrow
    * one. Parquet gives every consumer column PRUNING: the dictionary
    * reads only `anns`, the social graph only `authors`+`mens` (skipping
    * the fat `tok` entirely), the text model only `authors`+`tok`.
    * This is also the literal 100 TB shape — scan once, write the
    * (small) products table, feed every downstream stage with pruned
    * reads — which Pipeline.run's checkpointed "scan" stage already does;
    * this gives the in-memory compute() path the same materialization.
    */
  def materialize(products: DataFrame, dir: String): DataFrame = {
    val spark = products.sparkSession
    products.write.mode("overwrite").parquet(dir)
    // safety net: callers that never reach Result.unpersist (ad-hoc
    // Scaling/stage runs, thrown-away Results) would otherwise strand the
    // scratch dir on the local disk FOREVER — observed 70 GB of leaked
    // graft-scan-* dirs across a measurement day. Deleting at application
    // end keeps scratch lifetime ≤ session lifetime; dropScratch stays the
    // eager release for pipeline callers (it is idempotent, so both firing
    // is fine). A SIGKILL still leaks — that needs an external sweep, like
    // any Spark local-dir residue.
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          try dropScratch(spark, dir) catch { case _: Throwable => () }
      })
    spark.read.parquet(dir)
  }

  /** Scratch directory for [[materialize]] — under the first configured
    * spark.local.dir (tmpfs in the bench sessions), unique per call.
    */
  def scratchDir(spark: org.apache.spark.sql.SparkSession): String = {
    val root = spark.sparkContext.getConf
      .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
      .split(",").head
    s"$root/graft-scan-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** Delete a [[materialize]] scratch dir (Result.unpersist). */
  def dropScratch(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Is `df` already a scan-products frame (vs the raw corpus)? */
  def isScan(df: DataFrame): Boolean = df.columns.contains("anns")

  /** Accept either the raw corpus or an (ideally persisted) products frame
    * — lets every feature builder keep its `repos` signature while the
    * pipeline shares one persisted scan across all consumers.
    */
  def ensure(df: DataFrame): DataFrame = if (isScan(df)) df else products(df)

  /** Mentions.extract-identical rows, derived from the scan. */
  def mentions(scan: DataFrame): DataFrame =
    scan.select(col("repo"), col("path"), col("commit"), col("content_sha"),
        explode(col("anns")).as("m"))
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        col("m._1").as("kind"),
        col("m._2").as("screen_name"),
        col("m._3").as("display_name"))

  /** (src_screen, dst_screen) author×mention pairs — the social-graph raw
    * rows, derived in Catalyst (no content, no UDF): one array expression
    * per file, exploded. Order matches Features.coMentionPairsUdf (authors
    * outer, mentions inner); consumers aggregate, so order is cosmetic.
    */
  def coMentionPairs(scan: DataFrame): DataFrame =
    scan.select(explode(flatten(transform(col("authors"),
        a => transform(col("mens"),
          m => struct(a.as("src_screen"), m.as("dst_screen")))))).as("p"))
      .select(col("p.src_screen").as("src_screen"),
        col("p.dst_screen").as("dst_screen"))

  /** (screen_name, tok) rows for authored files — the per-account text
    * model's input, derived from the scan (was authoredContent's second
    * corpus read).
    */
  def authoredTokens(scan: DataFrame): DataFrame =
    scan.select(explode(col("authors")).as("screen_name"), col("tok"))
}
