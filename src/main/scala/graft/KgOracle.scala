package graft

import org.apache.spark.sql.SparkSession

/** DuckDB oracles for the kg pipeline stages.
  *
  * The pipeline's inputs are synthesized in-memory (BASELINE.json
  * input_hint: no external data), so DuckDB can't see them through the
  * driver's registered testdata views. Verify therefore MATERIALIZES the
  * synthesized corpus/accounts/entities to parquet at a fixed absolute
  * path, and these oracle statements read them with read_parquet() and
  * recompute each stage independently in SQL:
  *
  *   - kg_mentions      regexp_extract_all over content (three capture
  *                      groups zipped by ordinal), sha256 invariant
  *                      (BuildUserIndex.java:221-269 semantics)
  *   - kg_dictionary    screen→account join + identifier-split name
  *                      normalization + groupBy count
  *                      (BuildUserIndex.java:104-110, 271-297)
  *   - kg_social_graph  author×mention pairs per file, freq≥2 HAVING,
  *                      per-src normalized weights
  *                      (ExtractSocialGraph.java:75-96, 176-195)
  *   - kg_candidates_exact  query-name expansion (normalize + "Last,
  *                      First" swap), rollup, >300-candidate back-off,
  *                      top-40 window with total-order tie-break
  *                      (FillFromIndex.java:87-158; the fuzzy LSH tail is
  *                      excluded here and stays gated by the scalar-oracle
  *                      specs)
  *
  * The generator is deterministic, so the materialized parquet is a pure
  * function of the scale — the oracle inputs are ground truth the same way
  * the driver's documents.parquet is.
  */
object KgOracle {

  /** Fixed absolute root (the oracle SQL strings are static text — they
    * must name the same path Verify writes to).
    */
  val InputsRoot = "/root/repo/target/kg_inputs"

  def dirFor(scaleName: String): String = s"$InputsRoot/$scaleName"

  /** Verify runs at sf0.01 per the driver contract → Small scale. */
  private val OracleDir = dirFor(kg.CorpusGen.Small.name)

  /** Write the synthesized kg inputs for `sfDir`'s scale where DuckDB can
    * read them. Called by Verify.main before the query dump.
    */
  def materialize(spark: SparkSession, sfDir: String): Unit = {
    val scale = KgQueries.scaleFor(sfDir)
    val d = dirFor(scale.name)
    kg.CorpusGen.repos(spark, scale).toDF()
      .write.mode("overwrite").parquet(s"$d/corpus.parquet")
    kg.CorpusGen.accounts(spark, scale).toDF()
      .write.mode("overwrite").parquet(s"$d/accounts.parquet")
    kg.CorpusGen.entities(spark, scale).toDF()
      .write.mode("overwrite").parquet(s"$d/entities.parquet")
  }

  private def corpus = s"read_parquet('$OracleDir/corpus.parquet/*.parquet')"
  private def accounts = s"read_parquet('$OracleDir/accounts.parquet/*.parquet')"
  private def entities = s"read_parquet('$OracleDir/entities.parquet/*.parquet')"

  private val AnnRe = """// @(author|mention) (\S+) \(([^)]*)\)"""

  /** Text.splitName mirror: camelCase/snake_case breaks, whitespace
    * collapse, trim, lowercase.
    */
  private def splitNameSql(c: String): String =
    s"""lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  $c,
       |  '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
       |  '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
       |  '_', ' ', 'g'),
       |  '\\s+', ' ', 'g')))""".stripMargin

  /** Text.normalizeName mirror (no identifier split — query-name side). */
  private def normNameSql(c: String): String =
    s"lower(trim(regexp_replace($c, '\\s+', ' ', 'g')))"

  /** Text.swapLastFirst mirror: first ', ' at a positive index and no
    * second occurrence after it → swap halves.
    */
  private def swapSql(c: String): String =
    s"""CASE WHEN strpos($c, ', ') > 1
       |       AND strpos(substr($c, strpos($c, ', ') + 1), ', ') = 0
       |  THEN substr($c, strpos($c, ', ') + 2) || ' ' || substr($c, 1, strpos($c, ', ') - 1)
       |  ELSE $c END""".stripMargin

  val mentionsSql: String =
    s"""WITH m AS (
       |  SELECT repo, path, "commit", sha256(content) AS content_sha,
       |    regexp_extract_all(content, '$AnnRe', 1) AS ks,
       |    regexp_extract_all(content, '$AnnRe', 2) AS ss,
       |    regexp_extract_all(content, '$AnnRe', 3) AS ds
       |  FROM $corpus)
       |SELECT repo, path, "commit", content_sha, ks[i] AS kind,
       |  ss[i] AS screen_name, ds[i] AS display_name
       |FROM m, LATERAL (SELECT unnest(generate_series(1, len(ks))) AS i) t
       |ORDER BY repo, path, kind, screen_name, display_name""".stripMargin

  /** Shared dictionary CTE body (name, account_id, freq). */
  private val dictCte: String =
    s"""ann AS (
       |  SELECT ss[i] AS screen_name, ds[i] AS display_name
       |  FROM (SELECT regexp_extract_all(content, '$AnnRe', 2) AS ss,
       |               regexp_extract_all(content, '$AnnRe', 3) AS ds
       |        FROM $corpus) m,
       |       LATERAL (SELECT unnest(generate_series(1, len(ss))) AS i) t),
       |named AS (
       |  SELECT ${splitNameSql("display_name")} AS name, screen_name FROM ann),
       |dict AS (
       |  SELECT n.name, a.accountId AS account_id, count(*) AS freq
       |  FROM named n JOIN $accounts a ON n.screen_name = a.screenName
       |  WHERE length(n.name) >= 3
       |  GROUP BY n.name, a.accountId)""".stripMargin

  val dictionarySql: String =
    s"""WITH $dictCte
       |SELECT name, account_id, freq FROM dict ORDER BY name, account_id""".stripMargin

  val socialGraphSql: String =
    s"""WITH f AS (
       |  SELECT regexp_extract_all(content, '// @author (\\S+)', 1) AS aus,
       |         regexp_extract_all(content, '// @mention (\\S+)', 1) AS mes
       |  FROM $corpus),
       |p AS (
       |  SELECT aus[i] AS src_screen, mes[j] AS dst_screen
       |  FROM f,
       |       LATERAL (SELECT unnest(generate_series(1, len(aus))) AS i) t1,
       |       LATERAL (SELECT unnest(generate_series(1, len(mes))) AS j) t2),
       |e AS (
       |  SELECT sa.accountId AS src, da.accountId AS dst, count(*) AS freq
       |  FROM p JOIN $accounts sa ON p.src_screen = sa.screenName
       |         JOIN $accounts da ON p.dst_screen = da.screenName
       |  GROUP BY sa.accountId, da.accountId HAVING count(*) >= 2)
       |SELECT src, dst, freq,
       |  round(freq::DOUBLE / sum(freq) OVER (PARTITION BY src), 6) AS w
       |FROM e ORDER BY src, dst""".stripMargin

  val candidatesExactSql: String =
    s"""WITH $dictCte,
       |ent AS (SELECT id AS entity_id, names, labels FROM $entities WHERE NOT dead),
       |rawq AS (
       |  SELECT entity_id, ${normNameSql("nm")} AS n
       |  FROM (SELECT entity_id, unnest(names || labels) AS nm FROM ent)),
       |qn AS (
       |  SELECT DISTINCT entity_id, q AS qname FROM (
       |    SELECT entity_id, n AS q FROM rawq
       |    UNION ALL
       |    SELECT entity_id, ${swapSql("n")} AS q FROM rawq)
       |  WHERE length(q) >= 3),
       |full_r AS (
       |  SELECT q.entity_id, d.account_id, sum(d.freq) AS freq
       |  FROM qn q JOIN dict d ON q.qname = d.name
       |  GROUP BY q.entity_id, d.account_id),
       |over_m AS (
       |  SELECT entity_id FROM (
       |    SELECT entity_id, count(*) AS n_cand FROM full_r GROUP BY entity_id)
       |  WHERE n_cand > 300),
       |prim0 AS (
       |  SELECT e.entity_id, ${normNameSql("e.names[1]")} AS n
       |  FROM ent e JOIN over_m USING (entity_id)),
       |prim AS (
       |  SELECT entity_id, q AS qname FROM (
       |    SELECT entity_id, ${swapSql("n")} AS q FROM prim0)
       |  WHERE length(q) >= 3),
       |narrowed AS (
       |  SELECT p.entity_id, d.account_id, sum(d.freq) AS freq
       |  FROM prim p JOIN dict d ON p.qname = d.name
       |  GROUP BY p.entity_id, d.account_id),
       |kept AS (
       |  SELECT * FROM full_r
       |  WHERE NOT EXISTS (SELECT 1 FROM over_m o WHERE o.entity_id = full_r.entity_id)),
       |exact AS (SELECT * FROM kept UNION ALL SELECT * FROM narrowed)
       |SELECT entity_id, account_id, CAST(freq AS BIGINT) AS freq, rank FROM (
       |  SELECT entity_id, account_id, freq,
       |    row_number() OVER (PARTITION BY entity_id
       |      ORDER BY freq DESC, account_id ASC) AS rank
       |  FROM exact)
       |WHERE rank <= 40
       |ORDER BY entity_id, account_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "kg_mentions" -> mentionsSql,
    "kg_dictionary" -> dictionarySql,
    "kg_social_graph" -> socialGraphSql,
    "kg_candidates_exact" -> candidatesExactSql,
  )
}
