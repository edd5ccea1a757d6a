package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage 6: graph materialization into (subj, pred, obj) triples.
  *
  * Triple layout reproduces RDFExporter.java:180-196 with the blank nodes
  * skolemized deterministically (SURVEY §3.2): per scored candidate row
  * (entity e, account a, rank r, confidence s, is_alignment):
  *
  *   1. e  foaf:account        acc(a)           (only if is_alignment)
  *   2. e  owl:sameAs          rep(e)           (canonical representative)
  *   3. e  sl:candidate        cand(e,a)
  *   4. cand(e,a) sl:rank       r
  *   5. cand(e,a) sl:confidence s (%.6f)
  *   6. cand(e,a) sl:account    acc(a)
  *   7. acc(a) dcterms:identifier a
  *   8. acc(a) foaf:accountName  screen_name
  *
  * acc(a) = web:acc/<screen_name> (reference: http://twitter.com/<sn>,
  * RDFExporter.java:175-176); cand(e,a) = kb:candidate/<e-local>/<a>.
  *
  * Scale notes: output written pred-partitioned (8 predicates → 8 partitions,
  * each internally repartitioned by subj hash) so downstream per-predicate
  * scans prune; dedup of patterns 2/7/8 is a distinct on already-shuffled
  * keys.
  */
object Triples {

  def accountIri(screenName: Column): Column =
    concat(lit("web:acc/"), screenName)

  def candidateIri(entityId: Column, accountId: Column): Column =
    concat(lit("kb:candidate/"), regexp_replace(entityId, lit("^kb:resource/"), lit("")),
      lit("/"), accountId.cast("string"))

  /** triples(subj, pred, obj) from scored alignments + representatives. */
  def materialize(alignments: DataFrame, reps: DataFrame): DataFrame = {
    val a = alignments
      .join(reps, Seq("entity_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col("entity_id")))
      .withColumn("acc_iri", accountIri(col("screen_name")))
      .withColumn("cand_iri", candidateIri(col("entity_id"), col("account_id")))

    def t(subj: Column, pred: String, obj: Column): Column =
      struct(subj.as("subj"), lit(pred).as("pred"), obj.cast("string").as("obj"))

    val patterns = array(
      when(col("is_alignment"), t(col("entity_id"), "foaf:account", col("acc_iri"))),
      t(col("entity_id"), "owl:sameAs", col("rep")),
      t(col("entity_id"), "sl:candidate", col("cand_iri")),
      t(col("cand_iri"), "sl:rank", col("rank")),
      t(col("cand_iri"), "sl:confidence", format_string("%.6f", col("score"))),
      t(col("cand_iri"), "sl:account", col("acc_iri")),
      t(col("acc_iri"), "dcterms:identifier", col("account_id")),
      t(col("acc_iri"), "foaf:accountName", col("screen_name")))

    a.select(explode(patterns).as("t"))
      .filter(col("t").isNotNull)
      .select(col("t.subj"), col("t.pred"), col("t.obj"))
      .distinct()
  }
}
