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

  /** `// @author screen (Display Name)` / `// @mention screen (Display Name)` */
  private val AnnotationRe = "// @(author|mention) (\\S+) \\(([^)]*)\\)"

  def withSha(repos: DataFrame): DataFrame =
    repos.withColumn("content_sha", sha2(col("content"), 256))

  /** One output row per annotation occurrence:
    * (repo, path, commit, content_sha, kind, screen_name, display_name).
    */
  def extract(repos: DataFrame): DataFrame = {
    val re = lit(AnnotationRe)
    val zipped: Column = arrays_zip(
      regexp_extract_all(col("content"), re, lit(1)).as("kind"),
      regexp_extract_all(col("content"), re, lit(2)).as("screen_name"),
      regexp_extract_all(col("content"), re, lit(3)).as("display_name"))
    withSha(repos)
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        explode(zipped).as("m"))
      .select(col("repo"), col("path"), col("commit"), col("content_sha"),
        col("m.kind").as("kind"),
        col("m.screen_name").as("screen_name"),
        col("m.display_name").as("display_name"))
  }
}
