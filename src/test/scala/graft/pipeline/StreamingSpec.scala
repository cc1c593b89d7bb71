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

  test("latestState runs as a streaming aggregation and matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view", 1.5, """{"k":1}"""),
      (2L, ts(5), 7L, "click", 2.5, """{"k":2}"""),
      (3L, ts(5), 7L, "purchase", 3.5, """{"k":3}"""),
      (4L, ts(2), 8L, "view", 4.5, """{"k":4}"""))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val stream =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    // two arrival batches: the compacted state must keep updating
    stream.addData(rows.take(2))
    val q = Events.latestState(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("latest_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("latest_test")
      .select("user_id", "last_type", "last_value", "n_events")
      .as[(Long, String, Double, Long)].collect().toSet
    val want = Events.latestState(rows.toDF(cols: _*))
      .select("user_id", "last_type", "last_value", "n_events")
      .as[(Long, String, Double, Long)].collect().toSet
    assert(got == want &&
      got == Set((7L, "purchase", 3.5, 3L), (8L, "view", 4.5, 1L)))
  }

  test("slidingWindowStreaming matches the batch twin, 4 windows per event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val rows = Seq((base, "click", 1.0),
      (new java.sql.Timestamp(base.getTime + 40 * 60000L), "click", 2.0))
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(rows)
    val q = Events.slidingWindowStreaming(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("slide_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("slide_test")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = Events.slidingWindow(rows.toDF("ts", "event_type", "value"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // 2 events x 4 overlapping windows; the 00:45 and 01:00 starts are
    // shared (40 min apart), so 6 distinct (window, type) rows
    assert(got == want && got.size == 6)
    assert(got.count(_._3 == 2L) == 2)
  }

  test("burst windows stream in complete mode and match the batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view", 0.0, "{}"),
      (2L, ts(2), 7L, "view", 0.0, "{}"),     // window 0: n=2
      (3L, ts(601), 7L, "view", 0.0, "{}"),   // window 2: n=1
      (4L, ts(301), 8L, "view", 0.0, "{}"))   // window 1: n=1
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val stream =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    stream.addData(rows.take(2))
    val q = Events.burstWindows(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("burst_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(2))   // counts must keep updating
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("burst_test")
      .as[(Long, Long, Long)].collect().toSet
    val want = Events.burstWindows(rows.toDF(cols: _*))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.size == 3)
  }

  test("ab test report refreshes per micro-batch via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Structured Streaming rejects DISTINCT aggregations (n_users /
    // n_converted), so the live-dashboard deployment shape is the
    // foreachBatch materialized view: each micro-batch merges into
    // the event store and the BATCH report recomputes over it — the
    // same code path, refreshed per batch, exactly-consistent with
    // the batch answer at every refresh
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = (1L to 20L).map(i =>
      (i, ts(i.toInt), i % 7, if (i % 3 == 0) "purchase" else "view",
        i * 1.5, "{}"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    var store = Seq.empty[(Long, java.sql.Timestamp, Long, String,
      Double, String)].toDF(cols: _*)
    var lastReport: Set[(Long, Long, Long, Long, Long)] = Set.empty
    val stream =
      MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    val q = stream.toDF().toDF(cols: _*)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        store = store.unionByName(batch.toDF(cols: _*)).localCheckpoint()
        lastReport = Events.abTestReport(store)
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      }
      .start()
    try {
      stream.addData(rows.take(10))
      q.processAllAvailable()
      val mid = lastReport
      assert(mid == Events.abTestReport(rows.take(10).toDF(cols: _*))
        .as[(Long, Long, Long, Long, Long)].collect().toSet)
      stream.addData(rows.drop(10))
      q.processAllAvailable()
    } finally q.stop()
    val want = Events.abTestReport(rows.toDF(cols: _*))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(lastReport == want && want.nonEmpty)
  }

  test("N-Triples parse runs unchanged under Structured Streaming") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = graft.rdf.NTriples.parse(stream.toDF().toDF("line"))
      .writeStream.format("memory").queryName("nt_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        "<s:1> <:name> \"ann\" .",
        "<s:1> <:age> \"30\"^^<http://www.w3.org/2001/XMLSchema#double> .",
        "<s:1> <:knows> <s:2> ."))
      q.processAllAvailable()
      stream.addData(Seq("<s:2> <:name> \"bob\"@en ."))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("nt_stream_test")
    assert(rows.count() == 4)
    assert(rows.filter($"o_is_iri").count() == 1)
    assert(rows.filter($"o_num" === 30.0).count() == 1)
    assert(rows.filter($"lang" === "en").count() == 1)
  }

  test("streaming exact dedup drops in-watermark duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val q = Dedup.exactStreaming(stream.toDF().toDF("ts", "text"))
      .select("text")
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq((ts(0), "aaa"), (ts(1), "bbb")))
      q.processAllAvailable()
      stream.addData(Seq((ts(2), "aaa"), (ts(3), "ccc")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_stream_test").as[String].collect()
    assert(got.length == 3 && got.toSet == Set("aaa", "bbb", "ccc"))
  }

  test("streaming asof join matches the batch twin on ordered arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view"),
      (2L, ts(3), 7L, "view"),
      (3L, ts(5), 7L, "purchase"),   // matches view 2
      (4L, ts(8), 7L, "view"),
      (5L, ts(9), 7L, "purchase"),   // matches view 4 (state updated
                                     // across arrival batches)
      (6L, ts(9), 8L, "purchase"))   // no prior view for this user
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    stream.addData(rows.take(3))
    val q = Events.asofJoinStreaming(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("asof_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_stream_test")
      .select("event_id", "prev_id", "gap_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val want = Events.asofJoin(rows.toDF(cols: _*)
        .withColumn("value", lit(0.0)).withColumn("props", lit("{}")))
      .select("event_id", "prev_id", "gap_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == want && got == Set(
      (3L, Some(2L), Some(120000000L)),
      (5L, Some(4L), Some(60000000L)),
      (6L, None, None)))
  }

  test("streaming scd2 emits exactly the batch CLOSED versions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view", 1.0),
      (2L, ts(3), 7L, "click", 2.0),
      (3L, ts(5), 8L, "view", 3.0),
      // second arrival batch: closes version 2 for user 7 — state
      // carried across batches; user 8's single version never closes
      (4L, ts(9), 7L, "purchase", 4.0))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    stream.addData(rows.take(3))
    val q = Events.scd2Streaming(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("scd2_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd2_stream_test")
      .select("user_id", "event_id", "version", "valid_from_us",
        "valid_to_us", "event_type", "value")
      .as[(Long, Long, Int, Long, Long, String, Double)].collect().toSet
    val want = Events.scd2(rows.toDF(cols: _*).withColumn("props", lit("{}")))
      .filter(col("is_current") === 0)
      .select("user_id", "event_id", "version", "valid_from_us",
        "valid_to_us", "event_type", "value")
      .as[(Long, Long, Int, Long, Long, String, Double)].collect().toSet
    assert(got == want && got.size == 2)
  }

  test("parquet sink + checkpoint recovers exactly-once across restart") {
    // the operational contract a production pipeline leans on: a
    // file sink driven by a checkpointed query neither loses nor
    // duplicates rows when the query dies mid-stream and restarts
    // from the same checkpoint — Structured Streaming's end-to-end
    // exactly-once story, pinned as a test because every batch
    // operator in this repo is deployed through exactly this sink
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-08-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    def start() = stream.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "1 hour")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    stream.addData(Seq((1L, ts(1), "view"), (2L, ts(2), "click")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the same checkpoint; earlier offsets must not
    // re-emit, later ones must land
    stream.addData(Seq((3L, ts(3), "purchase")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      "restart from checkpoint must neither drop nor duplicate rows")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(dir)
  }

  test("streaming funnel hits reproduce the batch stage timestamps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view", 0.0),
      (2L, ts(10), 7L, "click", 0.0),
      (3L, ts(2), 8L, "click", 0.0), // click before any view: no hit
      (4L, ts(5), 8L, "view", 0.0),
      // second arrival batch: user 7 completes across the boundary
      // (state carried); user 8's click at +90 misses the 60-min gap
      (5L, ts(30), 7L, "purchase", 0.0),
      (6L, ts(95), 8L, "click", 0.0))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    stream.addData(rows.take(4))
    val q = Events.funnelStreaming(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("funnel_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_stream_test")
      .as[(Long, Int, Long)].collect().toSet
    // the batch operator's (user, t0..t2) rows, unpivoted to hits
    val batch = Events.funnel(rows.toDF(cols: _*)
      .withColumn("props", lit("{}")))
    val want = batch.select(col("user_id"),
        explode(arrays_zip(
          array((0 until 3).map(i => col(s"t$i")): _*),
          array((0 until 3).map(i => lit(i)): _*))).as("z"))
      .select(col("user_id"), col("z.1").as("stage"), col("z.0").as("us"))
      .filter(col("us").isNotNull)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
    // user 7 completes all three stages; user 8 only its view
    assert(got.map(h => (h._1, h._2)) ==
      Set((7L, 0), (7L, 1), (7L, 2), (8L, 0)))
  }

  test("streaming rolling-daily closes days exactly as the batch RANGE frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def ts(day: Int, i: Int = 0) =
      new java.sql.Timestamp(base.getTime + day * 86400000L + i * 1000L)
    // user 1 active on days 0,0,3,10 (gap > 7 between 3 and 10);
    // user 2 on days 1,2 — split across two arrival batches so day
    // state carries over the micro-batch boundary
    val rows = Seq((1L, ts(0)), (1L, ts(0, 1)), (2L, ts(1)),
      (1L, ts(3)), (2L, ts(2)), (1L, ts(10)))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    stream.addData(rows.take(3))
    val q = Events.rollingDailyStreaming(
        stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("rolling_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("rolling_stream_test")
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch rows for every day EXCEPT each user's still-open last one
    val batch = Events.rollingDaily(rows.toDF("user_id", "ts"))
    val lastDay = batch.groupBy(col("user_id"))
      .agg(max(col("day")).as("day"))
    val want = batch.join(lastDay, Seq("user_id", "day"), "left_anti")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    val d0 = base.getTime / 86400000L
    assert(got == Set((1L, d0, 2L, 2L), (1L, d0 + 3, 1L, 3L),
      (2L, d0 + 1, 1L, 1L)))
  }

  test("streaming transition pairs reproduce the batch bigram counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(1), 7L, "view", 0.0),
      (2L, ts(3), 7L, "click", 0.0),
      (3L, ts(5), 8L, "view", 0.0),
      // second arrival batch: pairs across the batch boundary — state
      // (the latest event) carried; user 8 stays single, no pair
      (4L, ts(9), 7L, "purchase", 0.0),
      (5L, ts(11), 7L, "view", 0.0))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    stream.addData(rows.take(3))
    val q = Events.transitionPairsStreaming(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("trans_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_stream_test")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val want = Events.transitionMatrix(rows.toDF(cols: _*)
        .withColumn("props", lit("{}")))
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(got == want && got == Set(
      ("view", "click", 1L),
      ("click", "purchase", 1L),
      ("purchase", "view", 1L)))
  }

  test("streaming lateness matches the batch profile across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (1L, ts(10), 7L, "view", 0.0),
      (2L, ts(5), 7L, "view", 0.0),   // 5 min late vs event 1
      (3L, ts(20), 7L, "view", 0.0),
      // second batch: running max carried across the batch boundary
      (4L, ts(19), 7L, "view", 0.0),  // 1 min late vs event 3
      (5L, ts(1), 8L, "purchase", 0.0))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    stream.addData(rows.take(3))
    val q = Events.latenessStreaming(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("late_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_stream_test")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L)).as("n_over_1m"),
        sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L)).as("n_over_1h"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val want = Events.latenessProfile(rows.toDF(cols: _*)
        .withColumn("props", lit("{}")))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains(("view", 4L, 2L, 300000000L, 1L, 0L)))
  }

  test("windowed hll sketch streams and matches the batch grouped sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // all rows inside one 1-hour window, so per-source results must
    // equal the batch grouped sketch over the same rows exactly —
    // same registers, same integers, same estimate double
    val rows = Seq(
      (1L, ts(1), "the quick brown fox jumps over the lazy dog today", "s0"),
      (2L, ts(5), "pack my box with five dozen liquor jugs right now", "s0"),
      (3L, ts(7), "the quick brown fox jumps over the lazy dog today", "s1"))
    val cols = Seq("doc_id", "ts", "text", "source")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    stream.addData(rows.take(2))
    val q = Sketch.hllNgramDistinctByWindowed(stream.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("hll_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(2)) // second arrival batch: registers merge
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hll_stream_test")
      .select("source", "n_present", "sum_fp", "estimate")
      .as[(String, Long, Long, Double)].collect().toSet
    val want = Sketch.hllNgramDistinctBy(rows.toDF(cols: _*))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == want && got.size == 2)
    // duplicate-blindness carries over: s1 is a subset duplicate of
    // s0's first doc, so its registers fold to that doc's sketch
    assert(got.map(_._1) == Set("s0", "s1"))
  }

  test("windowed CMS merges arrival batches into per-window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // window A gets text split across TWO arrival batches — the cell
    // vectors must ADD across batches; window B opens in the second
    val rows = Seq(
      (ts(1), "spark spark merge"),
      (ts(5), "spark data"),
      (ts(70), "merge merge window"))
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    stream.addData(rows.take(1))
    val q = Sketch.cmsTokenCountsWindowed(stream.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("cms_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(1)) // second batch: counts merge into A
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cms_stream_test")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = Sketch.cmsTokenCountsWindowed(rows.toDF("ts", "text"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want && got.size == 10) // 2 windows × 5 probes
    // with this handful of distinct tokens no cells collide, so the
    // min-over-rows estimates are the exact per-window counts —
    // including ZERO for probes the window never saw
    val byKey = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey((ts(0), "spark")) == 3L)
    assert(byKey((ts(0), "merge")) == 1L)
    assert(byKey((ts(0), "data")) == 1L)
    assert(byKey((ts(0), "window")) == 0L)
    assert(byKey((ts(60), "merge")) == 2L)
    assert(byKey((ts(60), "spark")) == 0L)
  }

  test("stream-stream interval join buffers both sides and honors the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-04-01 06:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // user 1: views at 0 and 30, purchase at 59 → both views match;
    // a view at 61 min BEFORE the purchase must not (hour boundary);
    // user 2: view AFTER its purchase must not match
    val views = Seq((10L, 1L, ts(0)), (11L, 1L, ts(30)), (12L, 2L, ts(50)),
      (13L, 1L, ts(-2)))
    val purchases = Seq((20L, 1L, ts(59)), (21L, 2L, ts(40)))
    val vs = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val ps = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cols = Seq("event_id", "user_id", "ts")
    // views arrive in one batch, purchases in a LATER one — the view
    // buffer must still hold rows when the purchase side catches up
    vs.addData(views)
    val q = Events.intervalJoinStreaming(
        vs.toDF().toDF(cols: _*), ps.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName("ivj_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ps.addData(purchases)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ivj_stream_test")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Events.intervalJoinStreaming(
        views.toDF(cols: _*), purchases.toDF(cols: _*))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.map(t => (t._2, t._3)) == Set((20L, 10L), (20L, 11L)))
  }

  test("windowed quantile histogram matches the batch brackets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // window A holds the batch spec's fixture (counts 1,2,3,4,8,16)
    // SPLIT across two arrival batches; window B is a lone doc
    val rows = Seq(
      (ts(1), words(1)), (ts(2), words(2)), (ts(3), words(3)),
      (ts(4), words(4)), (ts(5), words(8)), (ts(6), words(16)),
      (ts(70), words(5)))
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    stream.addData(rows.take(3))
    val q = Sketch.quantileHistWindowed(stream.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("qhist_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(3)) // bucket counts must ADD across batches
      q.processAllAvailable()
    } finally q.stop()
    // columns: ws, q, bucket, lo, hi, n_docs
    val got = spark.table("qhist_stream_test")
      .as[(java.sql.Timestamp, Int, Int, Long, Long, Long)].collect().toSet
    val want = Sketch.quantileHistWindowed(rows.toDF("ts", "text"))
      .as[(java.sql.Timestamp, Int, Int, Long, Long, Long)].collect().toSet
    assert(got == want && got.size == 6) // 2 windows × 3 quantiles
    // window A replays the batch PipelineSpec fixture: q50 → bucket 1
    // [2,3], q90/q99 → bucket 4 [16,31], n=6
    val a = got.filter(_._1 == ts(0)).map(t => t._2 -> ((t._3, t._4, t._5))).toMap
    assert(a(50) == ((1, 2L, 3L)) && a(90) == ((4, 16L, 31L)) &&
      a(99) == ((4, 16L, 31L)))
    assert(got.filter(_._1 == ts(0)).forall(_._6 == 6L))
    // window B: one 5-token doc → every quantile brackets [4,7]
    val b = got.filter(_._1 == ts(60))
    assert(b.forall(t => t._3 == 2 && t._4 == 4L && t._5 == 7L && t._6 == 1L))
  }

  test("contamination screens a doc stream against the static benchmark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = TextAnalysis.docGrams(
      Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"), 5)
      .select("g")
    val stream = MemoryStream[(Long, String)]
    val q = TextAnalysis.contaminationAgainst(
        TextAnalysis.docGrams(stream.toDF().toDF("doc_id", "text"), 5), bench)
      .writeStream.format("memory").queryName("contam_stream_test")
      .outputMode("complete").start()
    try {
      stream.addData(Seq(
        (1L, "alpha beta gamma delta epsilon eta theta"), // shares one 5-gram
        (2L, "one two three four five six seven")))       // clean
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("contam_stream_test")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("range search screens an embedding stream against a static query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus arrives as a stream; vec 0 is registered statically.
    // rangeSearch is a stateless filter, so it streams in append mode
    val static = Seq((0L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val stream = MemoryStream[(Long, Array[Float], Int)]
    val q = Similarity.rangeSearchAgainst(
        stream.toDF().toDF("vec_id", "embedding", "label"), static, tau = 0.9)
      .writeStream.format("memory").queryName("range_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, Array(0.99f, 0.05f), 0),   // cos ~0.998 → in range
        (2L, Array(0.0f, 1.0f), 1)))    // orthogonal → out
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("range_stream_test").as[Long].collect().toSet == Set(1L))
  }

  test("incremental N-Triples ingest merges idempotently via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the streaming-import story: parse the line stream, merge each
    // micro-batch into the store with set semantics — re-delivered
    // lines (at-least-once sources) must not duplicate triples
    var store = Seq.empty[(String, String, String, Option[Double], Boolean,
      Option[String])].toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val stream = MemoryStream[String]
    val q = graft.rdf.NTriples.parse(stream.toDF().toDF("line"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        store = graft.rdf.TripleOps.add(store, batch).localCheckpoint()
      }
      .start()
    try {
      stream.addData(Seq("<s:1> <:name> \"ann\" .", "<s:2> <:name> \"bob\" ."))
      q.processAllAvailable()
      // redelivery of batch 1 plus one new line
      stream.addData(Seq("<s:1> <:name> \"ann\" .", "<s:3> <:ref> <s:1> ."))
      q.processAllAvailable()
    } finally q.stop()
    assert(store.count() == 3)
    assert(store.filter(col("o_is_iri")).count() == 1)
  }

  test("gopher quality gate runs stateless on a doc stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = ("the data and thought of that line be good with more " +
      "words to fill out the minimum twenty word requirement here now")
    val stream = MemoryStream[(Long, String)]
    // append mode: the rules are a narrow per-row pass, no state at all
    val q = TextAnalysis.gopherQuality(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, good), (2L, "too short of a doc")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gopher_stream_test")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
    assert(got == Set((1L, true), (2L, false)))
  }

  test("sessionizeStreaming closes sessions on gap and emits via state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)

    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Events.sessionizeStreaming(
        stream.toDF().toDF("user_id", "ts"), gapMinutes = 30,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // session 1: two events 10 min apart; then a 110-min gap
      stream.addData(Seq((1L, ts(0)), (1L, ts(10))))
      q.processAllAvailable()
      stream.addData(Seq((1L, ts(120))))
      q.processAllAvailable()
    } finally q.stop()

    def us(t: java.sql.Timestamp) = t.getTime * 1000L
    val got = spark.table("sess_test")
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L, us(ts(0)), us(ts(10)))))
  }

  test("sessionizeStreaming: out-of-order events extend the open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val q = Events.sessionizeStreaming(
        stream.toDF().toDF("user_id", "ts"), gapMinutes = 30,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("sess_ooo_test")
      .outputMode("append").start()
    try {
      stream.addData(Seq((7L, ts(60))))
      q.processAllAvailable()
      // late but mergeable: must lower start_ts, not be swallowed
      stream.addData(Seq((7L, ts(40))))
      q.processAllAvailable()
      // close the session via gap
      stream.addData(Seq((7L, ts(200))))
      q.processAllAvailable()
    } finally q.stop()
    def us(t: java.sql.Timestamp) = t.getTime * 1000L
    val got = spark.table("sess_ooo_test")
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)]
      .collect().toSet
    assert(got == Set((7L, 2L, us(ts(40)), us(ts(60)))))
  }

  test("enrich runs as a stream-static broadcast join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val stream = MemoryStream[(Long, String, Double)]
    val q = Events.enrich(
        stream.toDF().toDF("user_id", "event_type", "value"), dim)
      .writeStream.format("memory").queryName("enrich_stream_test")
      .outputMode("complete").start()
    try {
      stream.addData(Seq((1L, "click", 1.5), (2L, "click", 2.0),
        (1L, "view", 4.0), (3L, "click", 8.0))) // 3 has no dim row
      q.processAllAvailable()
      stream.addData(Seq((1L, "click", 0.5)))   // rollup updates
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_stream_test")
      .select("segment", "event_type", "n", "sv")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("BUILDING", "click", 2L, 2.0),
      ("BUILDING", "view", 1L, 4.0),
      ("MACHINERY", "click", 1L, 2.0)))
  }
}
