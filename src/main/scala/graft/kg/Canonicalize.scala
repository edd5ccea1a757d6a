package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 5: canonicalization — connected components over high-confidence
  * same-as edges (score ≥ strongThreshold, ScoreEntities.java:141), every
  * node rewritten to its component representative (min id).
  *
  * GraphFrames is not on the classpath (SURVEY §7.0), so this is a pure
  * DataFrame implementation of alternating min-label propagation (the
  * large-star/small-star family, Kiveris et al. "Connected Components in
  * MapReduce and Beyond", SOCC'14): each round joins the current labels to
  * the symmetrized edge list, takes min(neighbor label, own label), and
  * stops when no label changes. Rounds are O(log n) on these graphs;
  * `localCheckpoint` cuts lineage each round so plans stay flat.
  *
  * Scale notes: every round is one shuffle on node id; the edge list is
  * symmetrized once up front. Skewed celebrity components are bounded by
  * topK per entity, and AQE skew-join splitting is on (Pipeline session
  * conf). Convergence check is a single count on the changed-rows filter.
  */
object Canonicalize {

  /** edges(src, dst) — undirected pairs; nodes are IRI strings. */
  def components(spark: SparkSession, edges: DataFrame, maxIter: Int = 20,
      verbose: Boolean = false): DataFrame = {
    // localCheckpoint (eager) BOTH materializes and TRUNCATES the logical
    // plan. Each round's plan embeds the previous round's frame twice
    // (once in the neighbor join, once in the union), so without lineage
    // truncation the plan tree doubles per round — exponential analysis
    // cost by iteration ~15 (the classic iterative-DataFrame trap; persist
    // alone caches data but keeps the logical plan growing).
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("node"))
      .distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min over own label and all neighbors' labels
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("comp"))
      val next = viaNeighbors.unionByName(labels)
        .groupBy(col("node"))
        .agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
      if (verbose) println(s"[cc] iter=$iter changed=$changed")
    }
    labels
  }

  /** Strong alignment edges: entity ↔ account IRI. */
  def strongEdges(alignments: DataFrame, conf: KgConf = KgConf()): DataFrame =
    alignments
      .filter(col("is_alignment") && col("score") >= lit(conf.strongThreshold))
      .select(col("entity_id").as("src"),
        Triples.accountIri(col("screen_name")).as("dst"))

  /** entity_id → representative (entities not in any component map to self). */
  def representatives(spark: SparkSession, alignments: DataFrame,
      conf: KgConf = KgConf()): DataFrame = {
    val comps = components(spark, strongEdges(alignments, conf))
    alignments.select(col("entity_id")).distinct()
      .join(comps.withColumnRenamed("node", "entity_id"), Seq("entity_id"), "left")
      .select(col("entity_id"), coalesce(col("comp"), col("entity_id")).as("rep"))
  }
}
