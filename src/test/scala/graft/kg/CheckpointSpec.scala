package graft.kg

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** North-rule resumability: a killed run resumes from the last completed
  * stage and produces byte-identical triples (SURVEY §7.3 risk 4).
  */
class CheckpointSpec extends AnyFunSuite with SparkTestBase {

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.select(col("subj"), col("pred"), col("obj")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("full run, then resume-from-scratch-kill, produce identical triples") {
    val root1 = Files.createTempDirectory("kg_run1").toString
    val r1 = Pipeline.run(spark, CorpusGen.Tiny, root1)
    val t1 = tripleSet(r1.triples)

    // simulate a mid-run kill: run a second root, then delete everything
    // from 'candidates' onward (as if the job died there), then resume
    val root2 = Files.createTempDirectory("kg_run2").toString
    Pipeline.run(spark, CorpusGen.Tiny, root2)
    for (stage <- Seq("candidates", "alignments", "representatives", "triples", "lineage")) {
      val dir = new java.io.File(Checkpoint.stageDir(root2, stage))
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val r2 = Pipeline.run(spark, CorpusGen.Tiny, root2) // resumes: corpus..dictionary cached
    assert(tripleSet(r2.triples) == t1)
  }

  test("second run over a completed root recomputes nothing and matches") {
    val root = Files.createTempDirectory("kg_run3").toString
    val a = tripleSet(Pipeline.run(spark, CorpusGen.Tiny, root).triples)
    val b = tripleSet(Pipeline.run(spark, CorpusGen.Tiny, root).triples)
    assert(a == b)
  }

  test("checkpoint table carries per-partition lineage rows for every stage") {
    val root = Files.createTempDirectory("kg_run4").toString
    Pipeline.run(spark, CorpusGen.Tiny, root)
    val cp = Checkpoint.readCheckpoints(spark, root)
    val stages = cp.select(col("stage")).distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("corpus", "entities", "accounts", "scan", "dictionary",
      "account_embeddings", "entity_embeddings",
      "candidates", "alignments", "representatives", "triples", "lineage"))
    // every row: n_rows > 0 somewhere, status done, wall_ms recorded
    assert(cp.filter(col("status") =!= "done").count() == 0)
    assert(cp.groupBy(col("stage")).agg(sum(col("n_rows")).as("n"))
      .filter(col("n") === 0).count() == 0)
  }
}
