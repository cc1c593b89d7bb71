package graft.pipeline

import graft.SharedSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming twin of events_window_agg: same transform function,
  * fed through MemoryStream with a watermark, must agree with the
  * batch run over the same rows.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("windowAggStreaming over MemoryStream matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(65), "click", 4.0),
      (ts(10), "view", 8.0), (ts(70), "view", 16.0))

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(rows)
    val streamDf = stream.toDF().toDF("ts", "event_type", "value")
    val q = Events.windowAggStreaming(streamDf)
      .writeStream.format("memory").queryName("win_agg_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_agg_test")
      .select("ws", "event_type", "cnt", "sv")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = Events.windowAgg(rows.toDF("ts", "event_type", "value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == want && got.size == 4)
  }
}
