package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators. `windowAgg` is the shared transform for
  * the batch anchor and its Structured Streaming twin (the streaming
  * side adds a watermark and runs the identical expression tree —
  * exercised in the test suite via MemoryStream).
  */
object Events {

  /** Tumbling-window aggregation per event type. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 6).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sv"))

  /** Streaming twin: same aggregation with a watermark for state
    * eviction — at scale this is what bounds the state store.
    */
  def windowAggStreaming(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", "2 hours"))

  /** Gap-based sessionization (new session after `gapMinutes` idle):
    * lag + cumulative-sum session ids, then per-session rollup.
    * One shuffle, partitioned by user — the classic scalable shape.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
  }
}
