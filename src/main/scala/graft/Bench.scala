package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints exactly ONE JSON line. Extra fields beyond the contract:
  * `triples_per_sec` (BASELINE.json throughput metric, from the kg_triples
  * full-pipeline query) and per-query row counts are folded into timings
  * only (rows are the driver's verify concern, not bench's).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = "/dev/shm/spark-local"
    new java.io.File(localDir).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var triplesPerSec = 0.0
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // kg_* queries share ONE memoized pipeline run per scale; whichever kg
    // query happens to run first pays the whole fill (~70-80% of its
    // reading). Fill the memo as an explicitly-timed line item instead so
    // every per-query number measures the query itself (the sweep total is
    // unchanged — the cost moves, it doesn't disappear).
    val prefill =
      if (selected.exists(_._1.startsWith("kg_"))) {
        val t0 = System.nanoTime()
        KgQueries.result(spark, sfDir) // eager: scan + dims + aligned.count
        Seq(("kg__shared_pipeline_fill", (System.nanoTime() - t0) / 1e9, 0L))
      } else Seq.empty
    val results = prefill ++ selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160)
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }
    // throughput metric: a DEDICATED full-pipeline run (kg queries memoize
    // one shared run, so their timings no longer measure the pipeline) —
    // synthesis included, nothing reused, warm JVM.
    if (only.isEmpty || only.exists(_.exists(_.startsWith("kg_")))) {
      // drop every cached frame the query sweep left behind so the
      // throughput run measures the pipeline, not storage-eviction thrash
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = kg.Pipeline.computeForScale(spark, KgQueries.scaleFor(sfDir))
      val n = r.triples.count()
      triplesPerSec = n / ((System.nanoTime() - t0) / 1e9)
      r.unpersist()
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rows = results.map { case (k, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => "\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // triples_per_sec protocol (keep in sync with BENCH/BASELINE.md):
    // dedicated full-pipeline run incl. corpus synthesis, nothing reused,
    // warm JVM, at KgQueries.scaleFor(sf) files, single run.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"errors":$errs,"n_errors":${errors.size},"sf":"$sfDir","triples_per_sec":$triplesPerSec,"triples_protocol":"dedicated full pipeline incl. synthesis at scaleFor(sf), nothing reused, warm JVM, single run, local[$cpus]"}"""
    println(line)
    // the driver's BENCH_r{N}.json keeps only a truncated tail of stdout,
    // which loses the per-query map — persist the full sweep to a file so
    // per-query regressions stay auditable round over round
    val sweepOut = sys.env.getOrElse("SPARK_GRAFT_SWEEP_OUT", "BENCH/sweep_latest.json")
    try {
      val p = java.nio.file.Paths.get(sweepOut)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] sweep file write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
