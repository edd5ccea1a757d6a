package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage 1: batched mention detection over `content` (north_star).
  *
  * The corpus attaches display names to screen names via structured
  * annotations, the way tweets attach names to uids
  * (/root/reference/alignments/.../index/BuildUserIndex.java:221-269:
  * IndexExtractor emits author ∪ mention rows into one stream).
  *
  * Implementation is pure Catalyst built-ins — `regexp_extract_all` +
  * `arrays_zip` + `explode` — so the whole stage stays inside
  * WholeStageCodegen; no UDF in the hot path. The per-row
  * `sha2(content, 256)` invariant column is computed HERE, at the scan,
  * and carried through the pipeline to the lineage output (input_hint).
  */
object Mentions {

  /** Annotation grammar: `// @author screen (Display Name)` /
    * `// @mention screen (Display Name)` — the regex form
    * `// @(author|mention) (\S+) \(([^)]*)\)` lives on in ScanKernelSpec
    * (property gate) and ScalarOracle (independent replay).
    */

  def withSha(repos: DataFrame): DataFrame =
    repos.withColumn("content_sha", sha2(col("content"), 256))

  /** All annotations of one content string in match order — the hand-rolled
    * marker scanner (Scan.scanMarkers, indexOf-skipping) filtered to
    * display-carrying matches, which is exactly this regex's match set
    * (ScanKernelSpec property-pins the kernel's anns against the
    * AnnotationRe formulation on hostile content; the DuckDB kg_mentions
    * replay re-derives the rows with a regex cross-engine). The previous
    * `CompiledRe.findAllMatchIn` walked the NFA over every char of every
    * content string; the kernel skips between `// @` candidates with the
    * intrinsified String.indexOf (~3× on the scalar scan, ScanMicro).
    */
  val annotationsUdf = udf((content: String) =>
    if (content == null) Seq.empty[(String, String, String)]
    else {
      val b = Seq.newBuilder[(String, String, String)]
      Scan.scanMarkers(content) { (isAuthor, screen, display) =>
        if (display != null)
          b += ((if (isAuthor) "author" else "mention", screen, display))
      }
      b.result()
    })

  /** One output row per annotation occurrence:
    * (repo, path, commit, content_sha, kind, screen_name, display_name).
    */
  def extract(repos: DataFrame): DataFrame =
    withSha(repos)
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        explode(annotationsUdf(col("content"))).as("m"))
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        col("m._1").as("kind"),
        col("m._2").as("screen_name"),
        col("m._3").as("display_name"))
}
