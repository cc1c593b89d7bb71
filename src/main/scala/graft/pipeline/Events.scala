package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.FastHash.md5 // shadows functions.md5 → Md5Fast (r19)
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Sliding-window rates: `width` windows advancing every `slide` —
    * each event lands in width/slide overlapping windows (4 here), the
    * shape behind rolling rate/alerting dashboards. Spark's window()
    * explodes the assignments map-side, so the shuffle carries one row
    * per (event, window) with partial aggregation; under streaming the
    * same plan's state is bounded by watermark × overlap.
    */
  def slidingWindow(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  def slidingWindowStreaming(events: DataFrame): DataFrame =
    slidingWindow(events.withWatermark("ts", "2 hours"))

  /** Trending leaderboard per sliding window: the top-k users of each
    * overlapping 1h/15min window — the "what's hot right now" query a
    * live dashboard refreshes. The sliding assignment multiplies rows
    * by windows-per-event (4 here) BEFORE one keyed partial-agg
    * shuffle; the rank is a per-window window function over the
    * already-aggregated (window, user) counts — per-partition linear,
    * integer keys, ties to the smaller user_id so every engine ranks
    * identically.
    */
  def slidingTopkUsers(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("ws"))
      .orderBy(col("n").desc, col("user_id").asc)
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("user_id"), col("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** AS-OF join, the union-window formulation: each `leftType` event
    * picks the MOST RECENT strictly-prior `rightType` event of the
    * same user — the point-in-time lookup relational engines ship as
    * ASOF JOIN and Spark lacks as a primitive. Composition beats a
    * join here: both slices union, shuffle ONCE on user_id, and a
    * running last-non-null window carries the right side forward to
    * each left row. A sort-merge as-of join would need both sides
    * co-partitioned and time-ordered anyway — exactly what the single
    * union sort provides, minus the join machinery and the second
    * shuffle. "Prior" is strict in the total (ts, event_id) order
    * (frame ends at -1), so same-timestamp pairs resolve
    * deterministically on any engine. Output: one row per left event
    * with the matched right id/time and the gap in micros (NULLs when
    * no prior right event exists); integers only → portable hashes.
    *
    * At 100 TB: one exchange keyed by user, per-user local sort, no
    * broadcast, no skew amplification (the window is a linear pass
    * per partition). The streaming twin of this shape is
    * flatMapGroupsWithState carrying the latest right-side event as
    * state — the same state [[latestState]]'s compaction maintains.
    */
  def asofJoin(events: DataFrame, leftType: String = "purchase",
               rightType: String = "view"): DataFrame = {
    val slice = events.filter(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def carried(c: org.apache.spark.sql.Column) =
      last(when(col("event_type") === rightType, c), ignoreNulls = true).over(w)
    slice
      .withColumn("prev_id", carried(col("event_id")))
      .withColumn("prev_us", carried(col("us")))
      .filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"),
        col("prev_id"), col("prev_us"),
        (col("us") - col("prev_us")).as("gap_us"))
  }

  final case class AsofEvent(event_id: Long, user_id: Long,
                             ts: java.sql.Timestamp, event_type: String)
  final case class AsofState(prev_id: Long, prev_us: Long)
  final case class AsofOut(event_id: Long, user_id: Long, ts_us: Long,
                           prev_id: Option[Long], prev_us: Option[Long],
                           gap_us: Option[Long])

  /** Streaming twin of [[asofJoin]]: per-user state is just the
    * LATEST right-side event seen (16 bytes — the same compacted
    * state [[latestState]] maintains), and each left event emits its
    * match immediately. Within a micro-batch events apply in
    * (ts, event_id) order, so the batch answer is reproduced exactly
    * whenever arrival order respects per-user event order across
    * batches (the per-key-ordered contract a Kafka-partitioned-by-user
    * feed provides); a right event arriving AFTER a later left event
    * already fired cannot retroactively re-match it — that's the
    * inherent trade of emitting point-in-time lookups eagerly on an
    * unbounded stream. State for idle users is evicted by event-time
    * timeout at the watermark plus `idleEvictMinutes`.
    */
  def asofJoinStreaming(events: DataFrame, leftType: String = "purchase",
                        rightType: String = "view",
                        watermark: String = "1 hour",
                        idleEvictMinutes: Int = 120): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.filter(col("event_type").isin(leftType, rightType))
      .selectExpr("event_id", "user_id", "ts", "event_type")
      .withWatermark("ts", watermark)
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[AsofOut]
          if (state.hasTimedOut) state.remove()
          else {
            var st = state.getOption.orNull
            var lastUs = 0L
            evs.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
              val t = us(e.ts)
              lastUs = math.max(lastUs, t)
              if (e.event_type == rightType) {
                if (st == null || t > st.prev_us ||
                  (t == st.prev_us && e.event_id > st.prev_id))
                  st = AsofState(e.event_id, t)
              } else {
                val m = Option(st)
                out += AsofOut(e.event_id, uid, t,
                  m.map(_.prev_id), m.map(_.prev_us),
                  m.map(s => t - s.prev_us))
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                lastUs / 1000L + idleEvictMinutes * 60000L)
            }
          }
          out.result().iterator
      }
  }

  final case class Scd2State(event_id: Long, us: Long, version: Int,
                             event_type: String, value: Double)
  final case class Scd2Closed(user_id: Long, event_id: Long, version: Int,
                              valid_from_us: Long, valid_to_us: Long,
                              event_type: String, value: Double)

  /** Streaming twin of [[scd2]]: per-user state is the one OPEN
    * version (id, start, counter — constant bytes per key); each
    * arriving event CLOSES it, emitting the finished validity
    * interval, and becomes the new open version. Append mode can
    * never retract, so the open row itself is not emitted — the
    * streaming output is exactly the batch scd2 rows with
    * `is_current = 0`, which is what the spec pins (per-key-ordered
    * arrival, the Kafka-partitioned-by-user contract, same as
    * [[asofJoinStreaming]]). Idle users evict by event-time timeout;
    * their open version simply never closes, matching batch.
    */
  def scd2Streaming(events: DataFrame, watermark: String = "1 hour",
                    idleEvictMinutes: Int = 120): Dataset[Scd2Closed] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("event_id", "user_id", "ts", "event_type", "value")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp, String, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[Scd2Closed]
          if (state.hasTimedOut) state.remove()
          else {
            var st = state.getOption.orNull
            var lastUs = 0L
            evs.toSeq.sortBy(e => (us(e._3), e._1)).foreach { e =>
              val t = us(e._3)
              lastUs = math.max(lastUs, t)
              if (st != null)
                out += Scd2Closed(uid, st.event_id, st.version, st.us,
                  t - 1, st.event_type, st.value)
              st = Scd2State(e._1, t,
                if (st == null) 1 else st.version + 1, e._4, e._5)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                lastUs / 1000L + idleEvictMinutes * 60000L)
            }
          }
          out.result().iterator
      }
  }

  /** Dimension enrichment: events joined with the customer dimension
    * and rolled up by market segment and event type. The dimension is
    * broadcast — the classic stream-enrichment shape, and the same
    * join is append-safe under Structured Streaming (stream-static).
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sv"))

  /** [[enrich]] for the skewed-fact case: when the per-user event
    * distribution is hot enough that a single reducer would drown (and
    * the dimension outgrows broadcast), the join salts on the unique
    * event id — same answer, the hot user spread over `salts`
    * reducers. See [[SkewJoin.salted]].
    */
  def enrichSkewSafe(events: DataFrame, customers: DataFrame,
                     salts: Int = 8): DataFrame =
    SkewJoin.salted(
      events,
      customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")),
      "user_id", col("event_id"), salts)
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sv"))

  /** Top-k users per event type by activity — the classic grouped
    * leaderboard. Two-level shape: the (type, user) rollup shuffles
    * once with map-side partial aggregation, then the per-type
    * row_number window ranks within each type's partition; ranking
    * keys are integers (count, then user id), so results are
    * engine-portable with no float ordering anywhere.
    */
  def topUsers(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id").asc)
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sv"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Gap sessionization via Spark's NATIVE session_window operator —
    * the idiomatic twin of [[sessionize]]'s lag/cumsum formulation,
    * and the form that runs under Structured Streaming with merging
    * session state out of the box. Bounds are epoch-micros; the
    * native window's end is last-event + gap.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))

  /** Ordered-stage conversion funnel: per user, the first `stages(0)`
    * event, then the first `stages(1)` within `gapMinutes` after it,
    * and so on — the classic product-analytics funnel. One filtered
    * aggregation per stage, every shuffle keyed by user_id (AQE reuses
    * the partitioning), and each stage only shuffles ITS OWN slice of
    * the log — at 100 TB that is k narrow passes, not a per-user
    * event-list collection. Stage times are epoch-micros BIGINTs and
    * the depth is an integer, so the result hashes identically on any
    * engine.
    */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase"),
             gapMinutes: Int = 60): DataFrame = {
    require(stages.nonEmpty, "funnel requires at least one stage")
    val gapUs = gapMinutes * 60L * 1000000L
    val s0 = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("t0"))
    val full = stages.zipWithIndex.drop(1).foldLeft(s0) { case (acc, (st, i)) =>
      val prev = s"t${i - 1}"
      val next = events.filter(col("event_type") === st)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .join(acc.select(col("user_id"), col(prev)), "user_id")
        .filter(col("us") > col(prev) && col("us") <= col(prev) + gapUs)
        .groupBy(col("user_id")).agg(min(col("us")).as(s"t$i"))
      acc.join(next, Seq("user_id"), "left")
    }
    full.withColumn("stage",
      stages.indices.map(i =>
        when(col(s"t$i").isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** Conversion funnel sliced by customer segment — the number
    * growth teams actually read ([[funnel]] says HOW MANY converted;
    * this says WHO): the per-user funnel stages joined once to the
    * dimension's segment column, rolled up to per-segment stage
    * counts and a 6dp conversion rate. The dimension join is
    * broadcast-scale; the rollup is ≤segments rows.
    */
  def funnelBySegment(events: DataFrame, customers: DataFrame,
                      stages: Seq[String] = Seq("view", "click", "purchase"),
                      gapMinutes: Int = 60): DataFrame =
    funnel(events, stages, gapMinutes)
      .select(col("user_id"), col("stage"))
      .join(broadcast(customers
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_entered"),
        sum(when(col("stage") === stages.size, 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn("conversion_rate",
        round(col("n_converted").cast("double") /
          col("n_entered").cast("double"), 6))

  /** Per-type hourly load profile: how many distinct hours the type
    * fired in, its median and peak hourly volumes, and how many hours
    * ran over 2× the median (the anomaly count a monitoring rule
    * would page on). Median is the exact interpolated percentile over
    * integer counts — lands on .0/.5 exactly, so it compares
    * bit-for-bit across engines.
    */
  def hourlyProfile(events: DataFrame): DataFrame = {
    val hour = floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long")
    val perHour = events.groupBy(col("event_type"), hour.as("h"))
      .agg(count(lit(1)).as("cnt"))
    val med = perHour.groupBy(col("event_type"))
      .agg(percentile(col("cnt"), lit(0.5)).as("median_cnt"),
        max(col("cnt")).as("peak_cnt"), count(lit(1)).as("n_hours"))
    perHour.join(med, "event_type")
      .groupBy(col("event_type"), col("median_cnt"), col("peak_cnt"),
        col("n_hours"))
      .agg(count(when(col("cnt") > col("median_cnt") * 2, 1))
        .as("n_anomalous"))
  }

  /** Daily activity rollup: DAU + event volume per epoch day —
    * integer outputs, one map-side-combined aggregation over the
    * (user, day) distinct. The companion health metric every event
    * log reports.
    */
  def dailyActive(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val perUserDay = events.select(day.as("day"), col("user_id"))
    perUserDay.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .join(perUserDay.groupBy(col("day")).agg(count(lit(1)).as("n_events")),
        "day")
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern (the one classic SQL shape the events
    * family didn't yet carry): on each user's DISTINCT active days,
    * day − row_number() is constant exactly within a consecutive
    * run, so one user-keyed window + one (user, island) fold yields
    * every streak; the per-user rollup keeps the longest. All exact
    * integers. Shape: the (user, day) distinct is the only
    * fact-scale shuffle; the window and folds ride the same user
    * keys.
    */
  def userStreaks(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    events.select(col("user_id"), day.as("day")).distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("max_streak"),
        sum(col("len")).as("active_days"))
  }

  /** Monthly engagement: MAU, summed DAU, day count, and the
    * DAU/MAU stickiness ratio per epoch month (30-day buckets, the
    * same integer-DIV day arithmetic as [[dailyActive]] — calendar
    * months would need a timezone policy; epoch buckets are
    * engine-exact). Stickiness = avg_dau / mau = sum_dau /
    * (n_days·mau): the exact integer witnesses ship alongside one
    * 6dp-rounded divide. Shape: the (user, day) distinct is the only
    * fact-scale shuffle; month rollups fold from per-day rows
    * (metadata scale).
    */
  def monthlyStickiness(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val perUserDay = events.select(day.as("day"), col("user_id")).distinct()
    val withMonth = perUserDay.withColumn("month",
      floor(col("day") / 30L).cast("long"))
    val dau = withMonth.groupBy(col("month"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy(col("month"))
      .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
    val mau = withMonth.select(col("month"), col("user_id")).distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("mau"))
    dau.join(mau, "month")
      .withColumn("stickiness",
        round(col("sum_dau").cast("double") /
          (col("n_days") * col("mau")).cast("double"), 6))
  }

  /** Weekly cohort retention: users bucket into the week of their
    * first event; each later active week counts toward
    * (cohort_week, offset_weeks). Week numbers are floor(epoch-days/7)
    * BIGINTs — integer outputs end to end. The (user, week) distinct
    * collapses the event volume FIRST (the only pass over the raw
    * log); everything after is user-keyed on the collapsed relation.
    */
  def retention(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L))
    val userWeeks = events
      .select(col("user_id"), floor(day / 7).cast("long").as("week"))
      .distinct()
    val cohorts = userWeeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    userWeeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("offset_weeks"))
      // (user, week) is distinct, so the count IS the user count
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user burst peak — the velocity screen beside
    * [[rateOutliers]]' lifetime-σ test: rateOutliers catches users
    * whose TOTAL volume is anomalous; this catches users whose worst
    * five minutes is (a scraper that runs one hot hour a day has an
    * ordinary lifetime count). For each user: the max event count
    * over tumbling windows and the EARLIEST window achieving it
    * (min_by over the zero-padded (max-count, window) string key —
    * the cross-engine-deterministic argmax idiom). Two partial-agg
    * shuffles: (user, window) then user.
    */
  /** The per-(user, window) counts [[burstPeak]] folds — public and
    * stateless-transform + one aggregation, so the SAME code runs
    * under Structured Streaming (complete/update mode; the
    * StreamingSpec twin pins the equality).
    */
  def burstWindows(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    events
      .select(col("user_id"),
        (floor(unix_micros(col("ts")) / winUs).cast("long") * winUs)
          .as("win_us"))
      .groupBy(col("user_id"), col("win_us"))
      .agg(count(lit(1)).as("n"))
  }

  def burstPeak(events: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val perWin = burstWindows(events, windowMinutes)
    perWin.groupBy(col("user_id"))
      .agg(max(col("n")).as("peak"),
        min_by(col("win_us"),
          concat(lpad((lit(1000000000000000000L) - col("n")).cast("string"),
            19, "0"), lpad(col("win_us").cast("string"), 20, "0")))
          .as("peak_win_us"),
        count(lit(1)).as("n_active_windows"))
  }

  /** Day-of-week activity profile — the weekly-seasonality card
    * beside the hourly profile (staffing, anomaly baselines, and
    * crawl scheduling all read it). Day index from epoch days
    * (+4: 1970-01-01 was a Thursday), a pure integer formula both
    * engines compute identically — no locale-dependent date builtin.
    * One partial-agg pass.
    */
  def weekdayProfile(events: DataFrame): DataFrame =
    events
      .select(((floor(unix_micros(col("ts")) / lit(86400000000L)) + 4) % 7)
        .cast("int").as("dow"), col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Lifetime value by signup cohort: users bucket into the week of
    * their first event ([[retention]]'s cohort definition), and each
    * cohort reports its size and total purchase revenue — the
    * LTV-by-cohort card a growth dashboard pairs with the retention
    * matrix. One user-keyed fold (first week + revenue in the same
    * pass), then a metadata-scale cohort fold; exact integer cents.
    */
  def ltvCohort(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
      floor(min(unix_micros(col("ts"))) / lit(604800000000L)).cast("long")
        .as("cohort_week"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"),
      count(lit(1)).as("n"))
    perUser.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cents")).as("revenue_cents"),
        sum(col("n")).as("n_events"))
  }

  /** A/B experiment report: users assigned to variants by an md5
    * slice of user_id (deterministic, decorrelated from every
    * doc-keyed slice in the ledger, stable under re-runs — the
    * property an experiment assignment MUST have), then per-variant
    * exposure / conversion / revenue in exact integers. One
    * partial-agg shuffle; the two distinct-user counts share the
    * same exchange.
    */
  def abTestReport(events: DataFrame, variants: Int = 2): DataFrame = {
    val variant = (conv(substring(
      md5(col("user_id").cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % variants).as("variant")
    events
      .select(variant, col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("variant"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        countDistinct(when(col("event_type") === "purchase", col("user_id")))
          .as("n_converted"),
        sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
          .as("revenue_cents"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the
    * marketing-warehouse sibling of [[retention]]: each user scored by
    * days since last event, lifetime event count, and purchase cents,
    * then bucketed into the shared log₂ (bit-length) grid and counted
    * per (r, f, m) cell. Log buckets instead of quantile ntiles by
    * design: quintiles need a global sort per metric (three total
    * sorts at 100 TB), while bit-length is a map-side projection, is
    * deterministic on every engine, and composes across shards by
    * addition — the same argument the conversion-lag histogram makes.
    *
    * One user-keyed fold over the log, a broadcast single-row corpus
    * max (the recency epoch), then a metadata-scale cell count.
    * All-integer outputs; non-positive metrics pin to bucket 0.
    */
  def rfm(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
      max(unix_micros(col("ts"))).as("last_us"),
      count(lit(1)).as("f"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("m_cents"))
    val corpusMax = perUser.agg(max(col("last_us")).as("max_us"))
    def bucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c <= 0, 0).otherwise(length(bin(c)).cast("int"))
    perUser.crossJoin(broadcast(corpusMax))
      .select(
        bucket(floor((col("max_us") - col("last_us")) / lit(86400000000L))
          .cast("long")).as("r_b"),
        bucket(col("f")).as("f_b"),
        bucket(col("m_cents")).as("m_b"),
        col("m_cents"))
      .groupBy(col("r_b"), col("f_b"), col("m_b"))
      .agg(count(lit(1)).as("n_users"), sum(col("m_cents")).as("segment_cents"))
  }

  /** Typed extraction from the semi-structured props column (JSON):
    * get_json_object is a codegen'd expression — no UDF — so schema-
    * on-read over a 100 TB event log stays one narrow pass before the
    * rollup shuffle.
    */
  def propsExtract(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"), max(col("k")).as("mx"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start_us: Long, last_us: Long, n_events: Long)
  /** Session bounds as epoch-micros longs — bit-identical with the
    * batch `sessionize` output (a Timestamp here would truncate to
    * millis and let the twins disagree on micro-resolution events).
    */
  final case class SessionOut(user_id: Long, n_events: Long,
                              start_us: Long, end_us: Long)

  /** Streaming sessionization: custom per-user state via
    * flatMapGroupsWithState. A session closes (and emits) when a new
    * event arrives after the idle gap, or when the event-time
    * watermark passes the gap (state timeout) — the watermark is what
    * bounds state at scale.
    *
    * A session's identity is (user_id, start_ts) — stable under
    * restarts and timeouts, unlike an ordinal counter, which would
    * reset when the timeout removes state. Out-of-order events inside
    * the watermark extend the open session's bounds; a late event
    * more than a gap BEFORE the open session emits immediately as its
    * own session (best effort — exact late-data sessionization would
    * require buffering the raw events in state).
    */
  def sessionizeStreaming(events: DataFrame, gapMinutes: Int = 30,
                          watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def emit(uid: Long, st: SessionState): SessionOut =
      SessionOut(uid, st.n_events, st.start_us, st.last_us)

    events.selectExpr("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, events, state) =>
          val out = Seq.newBuilder[SessionOut]
          if (state.hasTimedOut) {
            state.getOption.foreach(st => out += emit(uid, st))
            state.remove()
          } else {
            var st = state.getOption.orNull
            events.toSeq.sortBy(e => us(e.ts)).foreach { e =>
              val t = us(e.ts)
              st match {
                case null =>
                  st = SessionState(t, t, 1L)
                case s if t > s.last_us + gapUs =>
                  out += emit(uid, s)
                  st = SessionState(t, t, 1L)
                case s if t < s.start_us - gapUs =>
                  // late lone event well before the open session
                  out += emit(uid, SessionState(t, t, 1L))
                case s =>
                  st = s.copy(start_us = math.min(s.start_us, t),
                    last_us = math.max(s.last_us, t),
                    n_events = s.n_events + 1L)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.last_us / 1000L + gapMinutes * 60000L)
            }
          }
          out.result().iterator
      }
  }

  /** Gap-based sessionization (new session after `gapMinutes` idle):
    * lag + cumulative-sum session ids, then per-session rollup.
    * One shuffle, partitioned by user — the classic scalable shape.
    *
    * Session bounds are epoch-microsecond BIGINTs, not timestamps:
    * integers render identically in every engine, while timestamp
    * stringification varies with source precision (the events parquet
    * is TIMESTAMP_NS; DuckDB keeps nanos, Spark truncates to micros).
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
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
  }

  /** Session-duration distribution as a log₂ histogram — the
    * engagement-depth profile a product team reads (how long do
    * sessions last?), in the Sketch.quantileHist bucket idiom
    * (bucket = bit-length of the duration in seconds; exact
    * integers, no float log): [[sessionize]]'s per-session rows fold
    * to ≤64 bucket rows with event and single-event-session counts.
    * The histogram rows are the SAME monoid the streaming quantile
    * twin merges, so this profile composes across shards/days by
    * addition.
    */
  def sessionDurationHist(events: DataFrame,
                          gapMinutes: Int = 30): DataFrame = {
    val sess = sessionize(events, gapMinutes)
      .withColumn("dur_s", ((col("end_us") - col("start_us")) / 1000000L)
        .cast("long"))
    sess
      .withColumn("b",
        when(col("dur_s") === 0, lit(0))
          .otherwise(length(bin(col("dur_s"))).cast("int")))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .as("single_event_sessions"))
  }

  /** Changelog compaction (CDC "latest state per key"): one row per
    * user carrying the most recent event's fields, tie-broken by
    * event_id so the answer is deterministic even at equal
    * timestamps. Built on max_by over a (ts, event_id) struct key —
    * an algebraic aggregate that COMBINES MAP-SIDE, so the shuffle
    * carries one candidate row per (user, map partition), where the
    * equivalent ranking window shuffles every event. That reduction
    * is the whole game on a 100 TB changelog. (The string-typed
    * outputs keep the physical operator SortAggregate — local
    * per-partition sorts by user id, cheap next to shipping the full
    * history; PlanSpec pins the partial_max_by + single-exchange
    * shape.)
    */
  def latestState(events: DataFrame): DataFrame = {
    val key = struct(col("ts"), col("event_id"))
    events.groupBy(col("user_id")).agg(
      max_by(col("event_type"), key).as("last_type"),
      max_by(col("value"), key).as("last_value"),
      max_by(unix_micros(col("ts")), key).as("last_ts_us"),
      max_by(col("props"), key).as("last_props"),
      count(lit(1)).as("n_events"))
  }

  /** Stream-stream interval join: each purchase matched to ALL of the
    * same user's views within the preceding `interval` — BOTH sides
    * unbounded streams (unlike [[asofJoinStreaming]], which keeps one
    * latest-right row per user, this is Structured Streaming's
    * watermarked two-buffer join). ONE parameter drives both the
    * time-range predicate and the watermarks, so the state-eviction
    * horizon always covers the match window (a lateness bound
    * SHORTER than the range would silently drop views the range
    * still implies): a view is droppable once the purchase-side
    * watermark passes its timestamp + interval, so state stays
    * bounded by the interval, not the stream length. Works
    * identically on batch frames (watermarks are no-ops there),
    * which is what the spec asserts against.
    */
  def intervalJoinStreaming(views: DataFrame, purchases: DataFrame,
                            interval: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", interval)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", interval)
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL '$interval'"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("v_ts")).as("v_us"))
  }

  /** First-touch attribution: each purchase credited to the EARLIEST
    * same-user view inside the preceding window — the marketing twin
    * of [[asofJoin]]'s last-touch semantics, and the operator the
    * attribution-model argument is actually about. Composition of
    * the shipped interval join with one min_by fold keyed by
    * purchase (map-side combinable — the shuffle carries one
    * candidate per purchase per partition, not all views);
    * (v_us, view_id) struct ordering makes the earliest pick
    * deterministic at equal timestamps. Purchases with no qualifying
    * view keep a row with NULL credit (the unattributed slice a
    * report must show), via one left join back to the purchase set.
    */
  def firstTouch(events: DataFrame, interval: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    val credited = intervalJoinStreaming(views, purchases, interval)
      .groupBy(col("user_id"), col("purchase_id"), col("p_us"))
      // the earliest-(v_us, view_id) pick as a min_by over a
      // zero-padded string key — lexicographic order equals numeric
      // order at fixed width, and BOTH engines' min_by accept it
      // (DuckDB has no struct ordering key)
      .agg(min_by(col("view_id"),
        concat(lpad(col("v_us").cast("string"), 20, "0"),
          lpad(col("view_id").cast("string"), 20, "0")))
        .as("first_view_id"),
        min(col("v_us")).as("first_view_us"),
        count(lit(1)).as("n_views_in_window"))
    purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
      .join(credited, Seq("user_id", "purchase_id", "p_us"), "left_outer")
      .select(col("user_id"), col("purchase_id"), col("p_us"),
        col("first_view_id"), col("first_view_us"),
        coalesce(col("n_views_in_window"), lit(0L)).as("n_views_in_window"))
  }

  /** Conversion-lag distribution: how long after the FIRST qualifying
    * view does the purchase land? [[firstTouch]]'s credited pairs
    * folded into the shared log₂-seconds histogram (bit-length
    * buckets — exact integers, composable across shards by
    * addition), with the unattributed purchases counted in a
    * sentinel bucket −1 (a latency report that silently drops the
    * unattributed slice overstates attribution coverage).
    */
  def conversionLagHist(events: DataFrame,
                        interval: String = "1 hour"): DataFrame =
    firstTouch(events, interval)
      .withColumn("lag_s",
        when(col("first_view_us").isNull, lit(null))
          .otherwise(floor((col("p_us") - col("first_view_us")) / 1000000L)
            .cast("long")))
      .withColumn("b",
        when(col("lag_s").isNull, lit(-1))
          .when(col("lag_s") === 0, lit(0))
          .otherwise(length(bin(col("lag_s"))).cast("int")))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_purchases"),
        min(col("lag_s")).as("min_lag_s"), max(col("lag_s")).as("max_lag_s"))

  /** Slowly-changing-dimension Type 2 build from the changelog: every
    * event becomes a VERSIONED validity interval — `valid_from_us` =
    * its own timestamp, `valid_to_us` = the instant before the next
    * change (NULL while current), plus a version counter and an
    * `is_current` flag. The warehouse pattern for turning a CDC feed
    * into a point-in-time-joinable dimension ([[asofJoin]] is the
    * query-side twin that reads such a table).
    *
    * One exchange keyed by user, then a single linear window pass
    * computes version / lead — the same scalable shape as
    * [[sessionize]]. Interval bounds are epoch-micros BIGINTs (never
    * engine-formatted timestamps), values are carried verbatim (no
    * arithmetic → no float drift).
    */
  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .withColumn("version", row_number().over(w))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("version"),
        col("us").as("valid_from_us"),
        (col("next_us") - 1).as("valid_to_us"),
        when(col("next_us").isNull, 1).otherwise(0).as("is_current"),
        col("event_type"), col("value"))
  }

  final case class MaxTsState(max_us: Long)
  final case class LateEvent(user_id: Long, event_id: Long,
                             event_type: String, late_us: Long)

  /** Streaming twin of [[latenessProfile]]'s per-event lateness: the
    * per-user state is just the running max timestamp (8 bytes); each
    * arrival emits its lateness against that max and advances it.
    * Folding the emitted rows by type reproduces the batch profile
    * under per-key event_id-ordered arrival — and unlike batch, this
    * form measures TRUE arrival order when run against a live source,
    * which is exactly the watermark-tuning deployment.
    */
  def latenessStreaming(events: DataFrame,
                        watermark: String = "24 hours"): Dataset[LateEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("event_id", "user_id", "ts", "event_type")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[MaxTsState, LateEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[LateEvent]
          var mx = state.getOption.map(_.max_us).getOrElse(Long.MinValue)
          evs.toSeq.sortBy(_._1).foreach { e =>
            val t = us(e._3)
            val late = if (mx == Long.MinValue) 0L else math.max(mx - t, 0L)
            out += LateEvent(uid, e._1, e._4, late)
            mx = math.max(mx, t)
          }
          state.update(MaxTsState(mx))
          out.result().iterator
      }
  }

  /** Per-user event-rate outliers — the bot/abuse screen: users whose
    * event count exceeds mean + k·σ of the per-user distribution.
    * The σ test runs in EXACT integer arithmetic via
    * cross-multiplication: n > S/N + k·σ  ⇔  (n·N − S)² > k²·(N·Q − S²)
    * (LHS positive), with S = Σn, Q = Σn², N = user count — no float
    * mean or stddev to drift between engines. The squares are
    * computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): operands
    * reach ~10¹⁵ at 10⁹ users × 10⁶ events, so their squares need
    * 128-bit exactness BIGINT lacks. The 128-bit values stay INTERNAL:
    * the output projection is all int64 (user_id, n, nu, s) — a
    * decimal128 output column hash-flips the driver's Arrow
    * canonicalization even when values agree (r10 red row).
    * Shape: one fact-scale count shuffle, a single-row global fold
    * broadcast back — the outlier filter is map-side.
    */
  def rateOutliers(events: DataFrame, k: Int = 2): DataFrame = {
    val per = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    // Q = Σn² summed in DECIMAL(38,0), not BIGINT: each n² fits a long,
    // but the SUM reaches ~10²¹ at the 10⁹-users × 10⁶-events scale the
    // σ test is specced for — a BIGINT sum would silently wrap there.
    val g = per.agg(count(lit(1)).as("nu"), sum(col("n")).as("s"),
      sum((col("n") * col("n")).cast("decimal(38,0)")).as("q"))
    val dev = (col("n") * col("nu") - col("s")).cast("decimal(38,0)")
    val varN2 = (col("nu").cast("decimal(38,0)") * col("q").cast("decimal(38,0)") -
      col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)"))
    per.crossJoin(broadcast(g))
      .filter(col("n") * col("nu") > col("s") &&
        dev * dev > lit(k * k).cast("decimal(38,0)") * varN2)
      .select(col("user_id"), col("n"), col("nu"), col("s"))
  }

  /** Day-granularity traffic anomalies — [[rateOutliers]]'s calendar
    * twin: days whose event count exceeds mean + k·σ of the per-day
    * distribution (the incident/traffic-spike screen a pipeline runs
    * before trusting a day's data). Identical exact-integer σ test by
    * cross-multiplication — 128-bit squares stay INTERNAL, the output
    * projection is all int64. Shape: one date-keyed count shuffle
    * (cardinality = calendar days — metadata-scale), a single-row
    * fold broadcast back, map-side filter.
    */
  def anomalyDays(events: DataFrame, k: Int = 2): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val per = events.groupBy(day.as("day")).agg(count(lit(1)).as("n"))
    val g = per.agg(count(lit(1)).as("nu"), sum(col("n")).as("s"),
      sum((col("n") * col("n")).cast("decimal(38,0)")).as("q"))
    val dev = (col("n") * col("nu") - col("s")).cast("decimal(38,0)")
    val varN2 = (col("nu").cast("decimal(38,0)") * col("q") -
      col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)"))
    per.crossJoin(broadcast(g))
      .filter(col("n") * col("nu") > col("s") &&
        dev * dev > lit(k * k).cast("decimal(38,0)") * varN2)
      .select(col("day"), col("n"), col("nu"), col("s"))
  }

  /** Per-user 7-day rolling event volume over the SPARSE daily-count
    * frame: a RANGE frame (`rangeBetween(-6, 0)` on the day integer)
    * — unlike a ROWS frame, calendar gaps between active days are
    * honored, which is what "last 7 days" means for a user who skips
    * days. Exact integers throughout.
    *
    * Scale shape: one (user, day) count shuffle at fact scale, then a
    * user-keyed linear window pass — per-partition state is the frame
    * (≤7 live rows); no global sort anywhere.
    */
  def rollingDaily(events: DataFrame, days: Int = 7): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val daily = events.groupBy(col("user_id"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rangeBetween(-(days - 1), 0)
    daily.withColumn("n7", sum(col("n")).over(w))
  }

  /** Engagement concentration: the Gini coefficient of per-user event
    * counts, in exact integer arithmetic — the one-number card that
    * says whether activity is spread (≈0) or a whale economy (≈1).
    *
    * The textbook formula needs a GLOBAL rank over users — a scale
    * killer. But ties share a count, and within a tie group the
    * rank-weighted sum telescopes: Σᵢ i·xᵢ over a group of m users
    * with count n starting after c users is n·(m·c + m(m+1)/2),
    * independent of order inside the group. So the whole statistic
    * computes from the COUNT HISTOGRAM: one fact-scale user count,
    * one metadata-scale histogram (distinct count values), a window
    * over that tiny frame, one fold. gini_e6 = ⌊1e6·(2·Σi·x −
    * (N+1)·S) / (N·S)⌋ — the division is integer, numerator carried
    * in DECIMAL(38,0) internally (Σi·x reaches ~10²⁴ at 10⁹ users),
    * output all int64.
    */
  def engagementGini(events: DataFrame): DataFrame = {
    val per = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val h = per.groupBy(col("n")).agg(count(lit(1)).as("m"))
    // constant-key partition: the histogram is metadata-sized, so the
    // single-task window is over vocabulary, not users
    val one = substring(col("n").cast("string"), 0, 0)
    val w = Window.partitionBy(one).orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ch = h.withColumn("c", coalesce(sum(col("m")).over(w), lit(0L)))
    // n·(m·c + m(m+1)/2): the tie-group triangle number stays in
    // exact int64 (m(m+1) ≤ 2⁶³ to ~3·10⁹ users per bucket), the
    // cross products go DECIMAL(38,0) before they can wrap
    val ixTerm = col("n").cast("decimal(38,0)") *
      (col("m").cast("decimal(38,0)") * col("c").cast("decimal(38,0)") +
        expr("(m * (m + 1)) div 2").cast("decimal(38,0)"))
    ch.agg(sum(col("m")).as("nu"), sum(col("n") * col("m")).as("s"),
        sum(ixTerm).as("ix"))
      // INTEGRAL division (div → floor on the positive numerator) —
      // decimal `/` would round the scale-6 quotient half-up on the
      // Spark side while DuckDB's // floors, an ulp-edge flip class
      .select(col("nu"), col("s"),
        expr("CAST(((CAST(2 AS DECIMAL(38,0)) * ix" +
          " - CAST(nu + 1 AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))" +
          " * 1000000)" +
          " div (CAST(nu AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("gini_e6"))
  }

  /** Seasonal-naive forecast backtest — the baseline every traffic
    * forecast must beat, and a data-quality card in its own right
    * (a type whose same-weekday-last-week error explodes changed
    * behavior): per event type and day d, predict count(d−7), score
    * |actual − predicted|, roll up total/max absolute error over the
    * scored days. Exact integers end to end. Shape: one
    * (type, day)-keyed count shuffle (calendar-scale), a type-keyed
    * lag-7 window over the sparse day sequence (RANGE frame so
    * calendar gaps don't slip the season), metadata rollup.
    */
  def backtestSnaive(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val daily = events.groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    // the prediction is the count EXACTLY 7 days back (0 if that day
    // has no row): max over a RANGE frame pinned to [-7, -7]
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-7, -7)
    daily
      .withColumn("pred", max(col("n")).over(w))
      .filter(col("pred").isNotNull)
      .withColumn("abs_err", abs(col("n") - col("pred")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("abs_err")).as("total_abs_err"),
        max(col("abs_err")).as("max_abs_err"))
  }

  /** Day-over-day event-type mix drift: the L1 distance between
    * consecutive days' type distributions — the distribution-shift
    * alarm a pipeline checks before trusting a day (a new client
    * version or bot wave shows up here before any volume alarm).
    * EXACT integers by cross-multiplication over the common
    * denominator: Σ_t |n_t,d·N_{d−1} − n_t,d−1·N_d| carried in
    * DECIMAL(38,0) internally, emitted as ⌊L1·1e6⌋ by integral
    * division — no per-type float shares to drift.
    *
    * Shape: one (day, type) fact-scale count; the day×type GRID is
    * calendar × vocabulary (metadata), densified so a type absent on
    * one side contributes its full share; type-keyed RANGE [-1,-1]
    * windows pair strictly consecutive days.
    */
  def typeMixDrift(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    // checkpointed: totals, the type vocabulary, and the grid join all
    // read the counted frame — without it each leg re-runs the
    // fact-table count (3× the corpus scan at 100 TB for a
    // calendar×vocabulary-sized intermediate)
    val c = graft.Checkpoints.tracked(
      events.groupBy(day.as("day"), col("event_type"))
        .agg(count(lit(1)).as("n")))
    val totals = c.groupBy(col("day")).agg(sum(col("n")).as("nd"))
    val grid = totals.crossJoin(c.select(col("event_type")).distinct())
      .join(c, Seq("day", "event_type"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-1, -1)
    grid
      .withColumn("pn", max(col("n")).over(w))
      .withColumn("pnd", max(col("nd")).over(w))
      .filter(col("pn").isNotNull)
      .withColumn("term", abs(
        col("n").cast("decimal(38,0)") * col("pnd").cast("decimal(38,0)") -
          col("pn").cast("decimal(38,0)") * col("nd").cast("decimal(38,0)")))
      .groupBy(col("day"))
      .agg(max(col("nd")).as("n_events"),
        expr("CAST((sum(term) * 1000000)" +
          " div (CAST(max(nd) AS DECIMAL(38,0))" +
          " * CAST(max(pnd) AS DECIMAL(38,0))) AS BIGINT)").as("l1_e6"))
  }

  final case class RollState(days: Seq[(Long, Long)])
  final case class RollRow(user_id: Long, day: Long, n: Long, n7: Long)

  /** Streaming twin of [[rollingDaily]]: per-user state is the live
    * ≤`days`-entry (day, count) ring — CONSTANT per key, the property
    * that makes the operator streamable at all. A user's day row is
    * final once a LATER day arrives for that user (its count can no
    * longer grow), so the twin emits each (user, day, n, n7) on
    * day-advance in append mode — every day except each user's still
    * open last one, which the batch pass closes. Same per-key
    * event-time-ordered arrival assumption as [[funnelStreaming]];
    * the watermark bounds state for idle users.
    */
  def rollingDailyStreaming(events: DataFrame, days: Int = 7,
                            watermark: String = "1 hour"): Dataset[RollRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RollState, RollRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[RollRow]
          var ring = state.getOption.map(_.days.toVector).getOrElse(Vector.empty)
          def n7(at: Long, v: Vector[(Long, Long)]): Long =
            v.collect { case (d, c) if d > at - days && d <= at => c }.sum
          evs.toSeq
            .map(e => Math.floorDiv(e._2.getTime, 86400000L))
            .sorted
            .foreach { d =>
              ring.lastOption match {
                case Some((open, c)) if d == open =>
                  ring = ring.init :+ (open, c + 1)
                case Some((open, _)) if d > open =>
                  out += RollRow(uid, open, ring.last._2, n7(open, ring))
                  ring = (ring :+ (d, 1L)).filter(_._1 > d - days)
                case None => ring = Vector((d, 1L))
                case _ => () // late day under the ordered-arrival contract
              }
            }
          state.update(RollState(ring))
          out.result().iterator
      }
  }

  final case class FunnelState(ts: Seq[Long])
  final case class FunnelHit(user_id: Long, stage: Int, us: Long)

  /** Streaming twin of [[funnel]]: per-user state is the fixed-width
    * vector of reached-stage timestamps (stages × 8 bytes — constant
    * per key); an arriving stage-i event fills slot i when slot i−1
    * is filled, slot i is empty, and the event lands inside the gap
    * window — under per-key event-time-ordered arrival (the
    * Kafka-partitioned-by-user contract the other twins assume) the
    * FIRST qualifying event is the batch MIN, so each emitted
    * [[FunnelHit]] carries exactly the t_i the batch operator
    * computes. Folding hits per user reproduces the batch stage
    * count; idle users evict by event-time timeout (a user whose
    * funnel never completes stops costing state, matching batch —
    * missing stages are simply never emitted).
    */
  def funnelStreaming(events: DataFrame,
                      stages: Seq[String] = Seq("view", "click", "purchase"),
                      gapMinutes: Int = 60,
                      watermark: String = "1 hour",
                      idleEvictMinutes: Int = 240): Dataset[FunnelHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val stageIdx = stages.zipWithIndex.toMap
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("event_id", "user_id", "ts", "event_type")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[FunnelHit]
          if (state.hasTimedOut) state.remove()
          else {
            val ts = state.getOption.map(_.ts.toArray)
              .getOrElse(Array.fill(stages.size)(Long.MinValue))
            var lastUs = 0L
            evs.toSeq.sortBy(e => (us(e._3), e._1)).foreach { e =>
              val t = us(e._3)
              lastUs = math.max(lastUs, t)
              stageIdx.get(e._4).foreach { i =>
                val open =
                  if (i == 0) ts(0) == Long.MinValue
                  else ts(i) == Long.MinValue && ts(i - 1) != Long.MinValue &&
                    t > ts(i - 1) && t <= ts(i - 1) + gapUs
                if (open) { ts(i) = t; out += FunnelHit(uid, i, t) }
              }
            }
            state.update(FunnelState(ts.toSeq))
            if (lastUs > 0L)
              state.setTimeoutTimestamp(
                lastUs / 1000L + idleEvictMinutes * 60000L)
          }
          out.result().iterator
      }
  }

  final case class TransState(us: Long, event_id: Long, event_type: String)
  final case class TransPair(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of [[transitionMatrix]]'s bigram derivation:
    * per-user state is the LATEST event (type + order key — constant
    * bytes per key); each arrival emits its (prev, cur) transition
    * pair and replaces the state. Counting the emitted pairs yields
    * exactly the batch matrix under per-key-ordered arrival (the
    * Kafka-partitioned-by-user contract, same as [[asofJoinStreaming]]);
    * idle users evict by event-time timeout — their last event simply
    * never becomes a `from`, matching batch.
    */
  def transitionPairsStreaming(events: DataFrame,
                               watermark: String = "1 hour",
                               idleEvictMinutes: Int = 120): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("event_id", "user_id", "ts", "event_type")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state) =>
          val out = Seq.newBuilder[TransPair]
          if (state.hasTimedOut) state.remove()
          else {
            var st = state.getOption.orNull
            var lastUs = 0L
            evs.toSeq.sortBy(e => (us(e._3), e._1)).foreach { e =>
              val t = us(e._3)
              lastUs = math.max(lastUs, t)
              if (st != null) out += TransPair(uid, st.event_type, e._4)
              st = TransState(t, e._1, e._4)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                lastUs / 1000L + idleEvictMinutes * 60000L)
            }
          }
          out.result().iterator
      }
  }

  /** Top user-journey trigrams: the most common ordered THREE-step
    * event-type sequences across users — the path-analysis view
    * product teams read next to [[transitionMatrix]]'s one-step
    * probabilities (a funnel hypothesis generator: frequent
    * view→view→purchase paths are funnels nobody designed). Two
    * lead()s on the SAME user-keyed window (one exchange, one linear
    * pass — Spark collapses same-spec window functions into one
    * WindowExec), bigram... trigram counts partial-aggregate
    * map-side to ≤|types|³ rows, top-k via TakeOrderedAndProject
    * with lexical tie-breaks.
    */
  def journeyTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(k)
  }

  /** Behavioral transition matrix: for each ordered pair of event
    * types, how often the second directly follows the first within a
    * user's stream — the first-order Markov statistic behind funnel
    * design, next-event prediction baselines, and bot detection.
    *
    * One user-keyed exchange, a linear lead() pass per partition (the
    * [[sessionize]] shape), then the bigram counts partial-aggregate
    * map-side down to the ≤|types|² matrix; the row-conditional
    * probability is computed by a window over that matrix — metadata
    * scale, so the second pass is free. Ties are impossible: the
    * window orders by (us, event_id) with event_id unique, so every
    * engine sees the same successor. The probability rounds to 6dp
    * (one divide of two exact integers — rounding only guards the
    * engines' float FORMATTING, not accumulation, so 6dp is exact).
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(byFrom), 6))
  }

  /** Event-time lateness profile — the measurement a streaming
    * deployment SETS ITS WATERMARK from: treating event_id as the
    * ingest/arrival sequence (the ledger order ids are assigned in),
    * an event's lateness is how far its timestamp lags the running
    * maximum seen before it in the same user's arrival order. Per
    * event type: totals, late counts, the max, and threshold buckets
    * (1 min / 1 h) — all exact integers, so the "1 hour" in every
    * withWatermark call in this module is a number this key justifies
    * rather than folklore. One user-keyed exchange + a linear window
    * pass, then a map-side-combined fold to ≤types rows.
    */
  def latenessProfile(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("late_us",
        greatest(coalesce(max(col("us")).over(w) - col("us"), lit(0L)),
          lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L))
          .as("n_over_1m"),
        sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L))
          .as("n_over_1h"))
  }

  /** Time-series gap fill: resample each user's stream onto an hourly
    * grid spanning their observed range and FORWARD-FILL empty hours
    * with the last observation — the standard feature-store /
    * monitoring densification step before windowed models.
    *
    * Three bounded stages: (1) per-(user, hour) compaction via max_by
    * over the (us, event_id) struct — algebraic, combines map-side, so
    * the shuffle carries hours not events (the [[latestState]] idiom);
    * (2) the grid generated per user by `sequence()` over the min/max
    * hour — grid size is users × span-hours, governed by wall-clock
    * time, not event volume, so it GROWS SLOWER than the data at
    * scale; (3) one user-keyed window pass carries the fill. The
    * first grid hour always holds an observation (the span starts at
    * an observed hour), so fills are never NULL. Values are carried,
    * never computed — hash-portable.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val key = struct(col("us"), col("event_id"))
    val obs = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      // integer DIV, not a double divide: micros exceed 2^50, where a
      // float quotient invites boundary rounding; timestamps are
      // positive so truncating DIV is floor on both engines
      .withColumn("hour_us", expr(s"us DIV ${hourUs}L * ${hourUs}L"))
      .groupBy(col("user_id"), col("hour_us"))
      .agg(count(lit(1)).as("n_obs"),
        max_by(col("value"), key).as("v"),
        max_by(col("us"), key).as("obs_us"))
    // (user, hour)-grain relation read by BOTH the grid bounds fold
    // and the fill join — materialized once so the fact-scale scan +
    // aggregation doesn't run twice (r19, guide §5 reuse rule)
    val obsCk = graft.Checkpoints.tracked(obs)
    val grid = obsCk.groupBy(col("user_id"))
      .agg(min(col("hour_us")).as("h0"), max(col("hour_us")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(hourUs))).as("hour_us"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("hour_us"))
    grid.join(obsCk, Seq("user_id", "hour_us"), "left")
      .select(col("user_id"), col("hour_us"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("v"), ignoreNulls = true).over(fill).as("filled_value"),
        last(col("obs_us"), ignoreNulls = true).over(fill).as("filled_from_us"))
  }

  /** Survival curve over observed user lifetimes: S(w) = how many
    * users stayed active at least w whole weeks past their first
    * event (lifetime = last_day − first_day), plus the week's churn
    * count — the retention statistic a cohort product reads its decay
    * half-life from. [[retention]] crosses cohort×offset on RETURN
    * days; this collapses each user to one lifespan and asks a
    * different question: not "did they come back day k" but "how long
    * until they left for good".
    *
    * Scale shape: one user-keyed partial-agg fold (min/max day) at
    * fact scale, a lifespan-week histogram (vocabulary-scale), and
    * the survival reverse-cumulative as a window over that ladder —
    * the [[engagementGini]] telescoping idiom: never a global rank or
    * per-user sort. Exact integers throughout.
    */
  def survivalCurve(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val life = events.groupBy(col("user_id"))
      .agg(min(day).as("d0"), max(day).as("d1"))
      .select(expr("(d1 - d0) div 7").as("week"))
    val hist = life.groupBy(col("week")).agg(count(lit(1)).as("n_churned"))
    // survivors at week w = users whose lifespan reached ≥ w weeks =
    // reverse cumulative including the current rung
    val one = substring(col("week").cast("string"), 0, 0)
    val wAtLeast = Window.partitionBy(one).orderBy(col("week"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist
      .withColumn("n_surviving", sum(col("n_churned")).over(wAtLeast))
      .select(col("week"), col("n_surviving"), col("n_churned"))
  }

  /** Linear multi-touch attribution: every purchase splits one unit
    * of credit EQUALLY across all views inside the preceding
    * attribution window — the model that pays the whole journey,
    * where [[firstTouch]] pays only the opener. Integer-exact: each
    * touched view earns 1_000_000 div n_touches micro-credits
    * (truncating division both engines share), so per-channel sums
    * are reproducible bit-for-bit; the truncation remainder is
    * deliberately unassigned (documented — a "last-touch gets the
    * remainder" rule would re-introduce an ordering dependency).
    *
    * Output: one row per views-per-purchase band — how many
    * conversions had that journey length and the credit each view
    * earned — plus the total credited view count. Purchases with NO
    * in-window view appear as the n_touches=0 band (credit 0), via
    * one left join back to the purchase set — the unattributed slice
    * a report must show, mirroring [[firstTouch]]'s NULL-credit row
    * (ADVICE r11). The per-user interval join is
    * [[intervalJoinStreaming]]'s bounded-state shape; everything
    * after is vocabulary-scale.
    */
  def linearAttribution(events: DataFrame,
                        interval: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    val perPurchase = intervalJoinStreaming(views, purchases, interval)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_touches"))
    purchases.select(col("event_id").as("purchase_id"))
      .join(perPurchase, Seq("purchase_id"), "left")
      .na.fill(0L, Seq("n_touches"))
      .withColumn("credit_e6",
        when(col("n_touches") > 0, expr("1000000 div n_touches"))
          .otherwise(lit(0L)))
      .groupBy(col("n_touches"), col("credit_e6"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("n_touches")).as("n_views_credited"))
  }
}
