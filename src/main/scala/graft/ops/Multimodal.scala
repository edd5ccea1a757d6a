package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The actual codec libraries are NOT in this container, so the decode /
  * feature-extract kernel is a clearly-marked deterministic FAKE
  * (`fakeDecodeFeatures`) — but everything Spark-side is real and tested:
  * the schema (binary payload + metadata struct), the partition-batched
  * execution shape (`mapPartitions`, the Scala analogue of PySpark's
  * `mapInPandas`: one iterator per partition, amortized per-batch setup),
  * the frame-sampling slice logic, and the downstream aggregation.
  *
  * At scale: payloads dominate row size, so the input is repartitioned by
  * byte-budget, the kernel never collects, and feature rows (small) are
  * what shuffles afterwards — never the binaries.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      frames_sampled: Int,
      features: Array[Float])

  /** Synthesize a media table from documents: payload = utf-8 bytes of the
    * text (a stand-in binary), metadata derived deterministically.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("doc_id")), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(xxhash64(col("doc_id"), lit(1)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("doc_id"), lit(2)), lit(1080)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(xxhash64(col("doc_id"), lit(3)), lit(300)) + 1).cast("int").as("n_frames"))

  /** STUB — the real implementation would call an image/audio codec here
    * (e.g. javax.imageio / ffmpeg bindings). Deterministic fake: 8 float
    * "features" derived from payload bytes at frame-sampled offsets.
    */
  def fakeDecodeFeatures(payload: Array[Byte], nFrames: Int, sampleEvery: Int): (Int, Array[Float]) = {
    val sampled = math.max(1, nFrames / math.max(1, sampleEvery))
    val feats = new Array[Float](8)
    if (payload.nonEmpty) {
      var f = 0
      while (f < 8) {
        var acc = 0L
        var i = f
        while (i < payload.length) { acc += payload(i); i += 8 }
        feats(f) = (acc % 1000L).toFloat / 1000.0f
        f += 1
      }
    }
    (sampled, feats)
  }

  /** Partition-batched decode/feature-extract (mapInPandas analogue). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      sampleEvery: Int = 10): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("n_frames"))
      .as[(Long, String, Array[Byte], Int)]
      .mapPartitions { it =>
        // per-partition (≈ per-batch) setup would init the codec ONCE here
        it.map { case (id, kind, payload, nFrames) =>
          val (sampled, feats) = fakeDecodeFeatures(payload, nFrames, sampleEvery)
          MediaFeatures(id, kind, payload.length, sampled, feats)
        }
      }
  }

  /** Demo query: synthesize → batch-extract → per-kind feature stats. */
  def featureStats(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, synthesize(docs)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("frames_sampled")), 4).as("avg_frames"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
      .orderBy(col("kind"))
}
