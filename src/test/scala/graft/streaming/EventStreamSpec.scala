package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity: the streaming implementations must agree with the
  * batch DataFrame semantics on the same input (SURVEY §2.10 T2).
  */
class EventStreamSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("latest-wins: streaming state result equals batch max_by") {
    val batch = EventStream.latestBatch(graft.Tables.events(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = EventStream.runFileStream(spark, dir,
      df => EventStream.latestStreaming(spark, df), OutputMode.Update(), "latest_t")
    // Update mode may emit a key several times across micro-batches; the
    // LAST emission per key is the final state — with one batch it's one row
    val got = streamed.groupBy(col("user_id"))
      .agg(max_by(struct(col("ts"), col("event_id")), struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
  }

  test("windowed counts: streaming equals batch on the same window expr") {
    val events = graft.Tables.events(spark, dir)
    val batch = EventStream.windowedCounts(events)
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet
    val streamed = EventStream.runFileStream(spark, dir,
      EventStream.windowedCounts, OutputMode.Append(), "windowed_t")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet
    // Append mode only emits windows the watermark has closed; with a single
    // micro-batch the final windows may be withheld — check containment and
    // that the closed windows match exactly
    assert(streamed.subsetOf(batch))
    assert(streamed.nonEmpty || batch.size <= 1)
  }

  test("append mode watermark: windows emit on close, too-late events drop, " +
      "in-watermark late events count") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.Event]
    val q = EventStream.windowedCounts(ms.toDF()).writeStream
      .outputMode(OutputMode.Append()).format("memory").queryName("late_t").start()
    def ev(id: Long, day: Int, hour: Int) = EventStream.Event(id,
      java.sql.Timestamp.valueOf(f"2024-01-0$day%d $hour%02d:00:00"), 1L, "click", 1.0)
    try {
      // batch 1: two day-1 events + a day-3 event; after this batch the
      // watermark is day3 09:00 (max ts − 1h) — past the day-1 window end
      ms.addData(ev(1, 1, 5), ev(2, 1, 6), ev(3, 3, 10))
      q.processAllAvailable()
      // batch 2: ev 4 is TOO LATE (its day-1 window closed under the
      // watermark → dropped); ev 5 has ts below the watermark but its day-3
      // window is still open → it must COUNT (late-row filtering is by
      // window end, not raw ts); ev 6 keeps day 3 active
      ms.addData(ev(4, 1, 7), ev(5, 3, 8), ev(6, 3, 11))
      q.processAllAvailable()
      // batches 3+4: push the watermark past the day-3 window end so it
      // finalizes and appends
      ms.addData(ev(7, 5, 1))
      q.processAllAvailable()
      ms.addData(ev(8, 5, 2))
      q.processAllAvailable()
      val rows = spark.table("late_t")
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("w_start").toString.take(10),
          r.getAs[Long]("n"), r.getAs[Double]("total")))
        .sorted.toSeq
      // day-1 window: events 1,2 only (4 dropped); day-3 window: 3,5,6
      // (5 counted despite arriving under the watermark); day-5 window
      // still open → withheld by append mode
      assert(rows == Seq(("2024-01-01", 2L, 2.0), ("2024-01-03", 3L, 3.0)),
        s"got $rows")
    } finally q.stop()
  }
}
