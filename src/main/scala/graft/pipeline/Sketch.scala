package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.FastHash.md5 // shadows functions.md5 → Md5Fast (r19)

/** Distributed sketches for corpus statistics. The cardinality sketch
  * here is a PORTABLE HyperLogLog: registers derive from md5 hex via
  * integer/string ops only (no engine-private hash, no libm in the
  * register path), so any SQL engine reproduces the registers — and
  * therefore the estimate — bit for bit. That portability is also the
  * test story: the DuckDB oracle replays the identical construction.
  *
  * Scale shape: the input explodes to grams but immediately folds into
  * at most 2^p register rows via a map-side-combined MAX — no distinct,
  * no gram shuffle (duplicates cannot move a register maximum, so the
  * usual dedup pass is unnecessary BY CONSTRUCTION). At 100 TB the
  * shuffle carries ≤ 256 rows per map partition; the alternative exact
  * count shuffles every distinct gram.
  */
object Sketch {

  /** HyperLogLog estimate of the number of distinct lowercased word
    * n-grams in the corpus, m = 256 registers (p = 8).
    *
    * Register index = md5 hex chars 1-2 (8 bits); rho = leading-zero
    * bits of the 48-bit slice in hex chars 3-14, plus one — computed
    * with string ops (count leading '0' hex digits, then a 15-way CASE
    * on the first nonzero digit), never floating log. The register
    * sum Σ 2^-max(rho) runs in FIXED-POINT (2^(52-rho) as BIGINT), so
    * the harmonic mean is one exact integer sum — float summation
    * order can't perturb it on any engine. The final α·m²/Σ is a
    * fixed-shape double expression over that integer.
    *
    * Raw-range estimator (valid for true cardinality ≳ 2.5·m); the
    * small-range linear-counting correction needs ln(), which is not
    * bit-portable across engines, and the corpus gram space sits far
    * above the raw threshold anyway.
    */
  /** (register index, rho) of one md5 hex digest — the shared
    * register construction (see [[hllNgramDistinct]]).
    */
  private def registerRho(hx: org.apache.spark.sql.Column):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    // rho = leading-zero BITS of the 48-bit slice + 1, computed
    // arithmetically: for v > 0, bit_length(v) = length(bin(v)), so
    // lz = 48 − bit_length and rho = 49 − bit_length; v = 0 ⇒ 49.
    // Replaces two per-gram regexps (r19, guide step 4 — the regex
    // engine was the only non-trivial expression left in the register
    // fold); value-identical to the hex-string form for every digest,
    // and still plain integer/string ops any engine reproduces.
    val v48 = conv(substring(hx, 3, 12), 16, 10).cast("long")
    val rho = when(v48 === 0L, lit(49))
      .otherwise(lit(49) - length(bin(v48)).cast("int"))
    (conv(substring(hx, 1, 2), 16, 10).cast("long"), rho)
  }

  /** The estimate columns over a folded (n_present, fp) relation —
    * absent registers contribute 2^-0 = 1 → 2^52 in fixed point; the
    * double tree mirrors the oracle SQL token for token.
    */
  private def estimated(folded: DataFrame, keep: Seq[String]): DataFrame =
    folded.select(
      (keep.map(col) :+ col("n_present") :+
        (col("fp") + (lit(256) - col("n_present")) * lit(4503599627370496L))
          .as("sum_fp")): _*)
      .select(
        (keep.map(col) :+ col("n_present") :+ col("sum_fp") :+
          ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256))) * lit(65536) *
            lit(4503599627370496.0) / col("sum_fp").cast("double"))
            .as("estimate")): _*)

  private val fpSum =
    coalesce(sum(
      expr("cast(shiftleft(cast(1 as bigint), 52 - mx) as bigint)")),
      lit(0L))

  private def gramDigests(docs: DataFrame, n: Int, keep: Seq[String]): DataFrame =
    docs
      .select((keep.map(col) :+
        TextAnalysis.wsTokens(lower(col("text"))).as("w")): _*)
      .filter(size(col("w")) >= n)
      .select((keep.map(col) :+ explode(transform(
        sequence(lit(0), size(col("w")) - n),
        i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(n)))
          .cast("binary")))).as("hx")): _*)

  private def hllEstimateOf(digests: DataFrame): DataFrame = {
    val (r, rho) = registerRho(col("hx"))
    val registers = digests
      .select(r.as("r"), rho.as("rho"))
      .groupBy(col("r")).agg(max(col("rho")).as("mx"))
    estimated(
      registers.agg(count(lit(1)).as("n_present"), fpSum.as("fp")), Nil)
  }

  def hllNgramDistinct(docs: DataFrame, n: Int = 5): DataFrame =
    hllEstimateOf(gramDigests(docs, n, Nil))

  /** HLL accuracy eval — the "measured, not asserted" loop for the
    * cardinality sketch: the SHIPPED estimate next to the exact
    * distinct count and the relative error. The exact side is the
    * corpus-wide distinct shuffle the sketch exists to avoid — at
    * 100 TB this eval runs on a sampled slice (like every eval key),
    * and the number it reports is what justifies trusting the ≤256
    * register rows on the full corpus.
    */
  def hllErrorEval(docs: DataFrame, n: Int = 5): DataFrame = {
    // one gram-digest pass, materialized, read by both the estimate
    // fold and the exact distinct (r19, guide §5 reuse rule — the
    // O(tokens) md5 explode otherwise ran twice)
    val gd = graft.Checkpoints.tracked(gramDigests(docs, n, Nil))
    val est = hllEstimateOf(gd).select(col("estimate"))
    val exact = gd
      .agg(countDistinct(col("hx")).as("exact_distinct"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_distinct"), col("estimate"),
        round(lit(100.0) * (col("estimate") - col("exact_distinct")) /
          col("exact_distinct"), 4).as("err_pct"))
  }

  /** The sketch as a GROUPED aggregation: per-`groupCol` distinct
    * n-gram estimates in one pass. Register rows are keyed by
    * (group, register) — at most 256 per group survive the map-side
    * combine, so a million-group corpus shuffles ≤ 256M tiny rows
    * regardless of corpus size; the equivalent exact count shuffles
    * every distinct (group, gram).
    */
  def hllNgramDistinctBy(docs: DataFrame, groupCol: String = "source",
                         n: Int = 5): DataFrame = {
    val (r, rho) = registerRho(col("hx"))
    val registers = gramDigests(docs, n, Seq(groupCol))
      .select(col(groupCol), r.as("r"), rho.as("rho"))
      .groupBy(col(groupCol), col("r")).agg(max(col("rho")).as("mx"))
    estimated(
      registers.groupBy(col(groupCol))
        .agg(count(lit(1)).as("n_present"), fpSum.as("fp")),
      Seq(groupCol))
  }

  /** Approximate daily active users over the event log — the HLL
    * register fold keyed by epoch day, hashing user ids instead of
    * grams. The exact DAU (`events_daily_active`) shuffles one row
    * per distinct (user, day); this folds to ≤256 register rows per
    * day map-side — at 100 TB of events the shuffle shrinks from the
    * user×day distinct to kilobytes per day, and the SAME fold runs
    * under a watermarked event-time window for streaming DAU (the
    * windowed-HLL Aggregator in this file is exactly that monoid).
    */
  def hllDailyActive(events: DataFrame): DataFrame = {
    val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
    val (r, rho) = registerRho(md5(col("user_id").cast("string").cast("binary")))
    val regs = events.select(day.as("day"), r.as("r"), rho.as("rho"))
      .groupBy(col("day"), col("r")).agg(max(col("rho")).as("mx"))
    estimated(
      regs.groupBy(col("day"))
        .agg(count(lit(1)).as("n_present"), fpSum.as("fp")), Seq("day"))
  }

  /** Pairwise source-overlap matrix from the per-source HLL sketches:
    * for every pair of sources, the distinct-gram estimate of each
    * side, of their UNION, and (by inclusion-exclusion) of their
    * INTERSECTION — "how much does source A's content overlap source
    * B's", the dataset-curation question behind mixture design and
    * cross-source contamination checks.
    *
    * The union sketch is free by the HLL merge property: max the two
    * register vectors — no second corpus pass, no gram shuffle. So the
    * corpus is read ONCE (the same ≤256-rows-per-source register fold
    * as [[hllNgramDistinctBy]]); everything after operates on S×256
    * register rows where S is the number of SOURCES — metadata scale.
    * Pair enumeration is O(S²) register-row joins, fine for catalog
    * source counts; a million-source corpus would pre-filter pairs by
    * a cheaper signal first. Estimates are the same fixed-shape double
    * expression over exact integer register sums as the base sketch,
    * and the intersection is one subtraction of those doubles — every
    * engine computes the identical IEEE tree.
    */
  def hllSourceOverlap(docs: DataFrame, groupCol: String = "source",
                       n: Int = 5): DataFrame = {
    val (r, rho) = registerRho(col("hx"))
    // the register relation feeds FOUR branches (per-source fold,
    // source list, both pair-join sides); checkpointed, the corpus
    // gram pass runs once and every branch reads S×256 tiny rows
    val regs = graft.Checkpoints.tracked(gramDigests(docs, n, Seq(groupCol))
      .select(col(groupCol).as("g"), r.as("r"), rho.as("rho"))
      .groupBy(col("g"), col("r")).agg(max(col("rho")).as("mx")))
    val perSource = estimated(
      regs.groupBy(col("g"))
        .agg(count(lit(1)).as("n_present"), fpSum.as("fp")), Seq("g"))
      .select(col("g"), col("estimate"))
    val srcs = regs.select(col("g")).distinct()
    val pairs = srcs.select(col("g").as("ga"))
      .join(srcs.select(col("g").as("gb")), col("ga") < col("gb"))
    val unionRegs = pairs.join(regs, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("r"), col("mx"))
      .union(pairs.join(regs, col("g") === col("gb"))
        .select(col("ga"), col("gb"), col("r"), col("mx")))
      .groupBy(col("ga"), col("gb"), col("r")).agg(max(col("mx")).as("mx"))
    val unionEst = estimated(
      unionRegs.groupBy(col("ga"), col("gb"))
        .agg(count(lit(1)).as("n_present"), fpSum.as("fp")), Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("estimate").as("est_union"))
    unionEst
      .join(perSource.select(col("g").as("ga"), col("estimate").as("est_a")),
        "ga")
      .join(perSource.select(col("g").as("gb"), col("estimate").as("est_b")),
        "gb")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"))
  }

  /** Portable Count-Min sketch over corpus tokens, depth 4 × width
    * 256: row j's bucket is md5 hex chars (2j+1, 2j+2) — four
    * disjoint 8-bit slices of one digest, so the whole sketch costs
    * ONE hash per token. The sketch itself is 1024 (j, bucket, cnt)
    * rows built with map-side combine — bounded state at any corpus
    * size, the frequency-estimation companion of the HLL cardinality
    * sketch (exact token counts shuffle the full vocabulary; the CMS
    * shuffles 1024 rows). Estimates for the broadcast `probes` list
    * are the classic min-over-rows upper bound, reported next to the
    * exact count of the same probes so the overcount is visible.
    * Integer-only output; DuckDB replays the construction exactly.
    */
  def cmsTokenCounts(docs: DataFrame,
                     probes: Seq[String] = Seq("spark", "merge", "window",
                       "the", "data")): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs
      .select(explode(TextAnalysis.wsTokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
    def buckets(h: org.apache.spark.sql.Column) =
      (0 until 4).map(j =>
        struct(lit(j).as("j"),
          conv(substring(h, 1 + 2 * j, 2), 16, 10).cast("int").as("b")))
    val cells = toks
      .select(explode(array(buckets(md5(col("token").cast("binary"))): _*))
        .as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    import spark.implicits._
    val probeBuckets = probes.toDF("token")
      .select(col("token"),
        explode(array(buckets(md5(col("token").cast("binary"))): _*)).as("c"))
      .select(col("token"), col("c.j").as("j"), col("c.b").as("b"))
    // LEFT join + coalesce(0): an empty bucket is a ZERO estimate
    // (the min must include it) — an inner join would silently drop
    // empty buckets and overestimate absent tokens
    val est = probeBuckets
      .join(broadcast(cells), Seq("j", "b"), "left_outer")
      .groupBy(col("token")).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    val exact = toks.filter(col("token").isin(probes: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("token"), "left_outer")
      .select(col("token"), col("est"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
  }

  /** Portable approximate quantiles of the per-document token count
    * via a log2 (exponential) histogram — the quantile companion of
    * the HLL (cardinality) and CMS (frequency) sketches. Bucket =
    * floor(log2(v)) computed as length(bin(v)) - 1: pure integer/
    * string ops, so any engine reproduces the histogram exactly.
    *
    * Scale shape: the corpus folds map-side into at most 64 bucket
    * rows (one count per power of two) — the shuffle carries ≤ 64
    * rows per map partition at any corpus size, where an exact
    * quantile sorts (or multi-passes) the full value column. Each
    * requested quantile q is then the first bucket whose cumulative
    * count reaches the nearest rank ceil(q·n/100), reported with its
    * exact [2^b, 2^(b+1)-1] value bounds — a deterministic bracket,
    * never an interpolated float (interpolation formulas drift
    * between engines; bucket ranks cannot).
    */
  def quantileHist(docs: DataFrame,
                   qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val v = size(TextAnalysis.wsTokens(col("text")))
    val hist = docs
      .select((length(bin(v.cast("long"))) - 1).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    // cumulative over the ALREADY BOUNDED histogram needs one
    // partition; the non-foldable constant keeps the spec defined so
    // WindowExec doesn't warn (a bare lit is stripped by
    // EliminateWindowPartitions)
    val one = substring(col("b").cast("string"), 0, 0)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(one).orderBy(col("b"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(one)))
    // one row: for each q the minimal bucket at/above its rank
    val aggCols = max(col("n")).as("n_docs") +:
      qs.map(q => min(when(
        col("cum") >= expr(s"(n * $q + 99) div 100"), col("b")))
        .as(s"b$q"))
    val wide = cum.agg(aggCols.head, aggCols.tail: _*)
    wide.select(
      explode(array(qs.map(q =>
        struct(lit(q).as("q"), col(s"b$q").as("bucket"))): _*)).as("s"),
      col("n_docs"))
      .select(col("s.q").as("q"), col("s.bucket").as("bucket"),
        expr("cast(shiftleft(cast(1 as bigint), s.bucket) as bigint)")
          .as("lo"),
        expr("cast(shiftleft(cast(1 as bigint), s.bucket + 1) - 1 as bigint)")
          .as("hi"),
        col("n_docs"))
  }

  private[pipeline] case class HllOut(n_present: Long, fp: Long)

  /** The register fold as ONE typed aggregation — the form Structured
    * Streaming requires (the batch twin's register→group two-level
    * aggregation is two chained stateful aggs, which a streaming plan
    * cannot run). State per group is the 256-byte register vector
    * itself; merge is elementwise max — associative, commutative, and
    * exactly the monoid the batch groupBy computes, so the folded
    * (n_present, fp) integers — and therefore the estimate — are
    * bit-identical to the batch path. A typed Aggregator (not a SQL
    * function tree) is the right tool precisely here: custom BOUNDED
    * aggregation state walked through the streaming state store.
    */
  private object HllRegistersAgg extends org.apache.spark.sql.expressions
      .Aggregator[(Long, Int), Array[Byte], HllOut] {
    override def zero: Array[Byte] = new Array[Byte](256)
    override def reduce(b: Array[Byte], a: (Long, Int)): Array[Byte] = {
      val i = a._1.toInt
      if (a._2 > b(i)) b(i) = a._2.toByte
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < 256) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(b: Array[Byte]): HllOut = {
      var np = 0L; var fp = 0L; var i = 0
      while (i < 256) {
        if (b(i) > 0) { np += 1; fp += 1L << (52 - b(i)) }
        i += 1
      }
      HllOut(np, fp)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[HllOut] =
      org.apache.spark.sql.Encoders.product[HllOut]
  }

  /** Big-endian long vectors in byte buffers — the shape streaming
    * Aggregator state wants (the state store walks byte arrays).
    */
  private[pipeline] object LongVec {
    def get(b: Array[Byte], i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v = (v << 8) | (b(i * 8 + k) & 0xffL); k += 1 }
      v
    }
    def put(b: Array[Byte], i: Int, v: Long): Unit = {
      var k = 0
      while (k < 8) { b(i * 8 + k) = (v >>> (8 * (7 - k))).toByte; k += 1 }
    }
    def addInto(x: Array[Byte], y: Array[Byte], cells: Int): Array[Byte] = {
      var i = 0
      while (i < cells) { put(x, i, get(x, i) + get(y, i)); i += 1 }
      x
    }
  }

  private[pipeline] case class CmsWinOut(est: Seq[Long])

  /** The 4×256 CMS count fold as ONE typed aggregation, for the same
    * reason as [[HllRegistersAgg]]: the batch path's per-cell count +
    * min-probe is two chained stateful aggs, which a streaming plan
    * cannot run. State per group is the flattened 1024-cell count
    * vector (8 KiB, big-endian longs in a byte buffer — the state
    * store walks byte arrays); merge is elementwise ADD — the CMS
    * monoid — so folded cell counts equal the batch groupBy counts
    * exactly. The probe cells are fixed at construction (4 md5-slice
    * buckets per probe token), so finish() emits the min-over-rows
    * estimates directly; an empty cell keeps its zero in the min,
    * preserving the batch path's LEFT-join semantics.
    */
  private[pipeline] class CmsCellsAgg(probeCells: Seq[Seq[Int]])
      extends org.apache.spark.sql.expressions
        .Aggregator[(Int, Int, Int, Int), Array[Byte], CmsWinOut]
      with Serializable {
    import LongVec.{get, put}
    override def zero: Array[Byte] = new Array[Byte](8192)
    override def reduce(b: Array[Byte], a: (Int, Int, Int, Int)): Array[Byte] = {
      put(b, a._1, get(b, a._1) + 1L)
      put(b, a._2, get(b, a._2) + 1L)
      put(b, a._3, get(b, a._3) + 1L)
      put(b, a._4, get(b, a._4) + 1L)
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      LongVec.addInto(x, y, 1024)
    override def finish(b: Array[Byte]): CmsWinOut =
      CmsWinOut(probeCells.map(cells => cells.map(get(b, _)).min))
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[CmsWinOut] =
      org.apache.spark.sql.Encoders.product[CmsWinOut]
  }

  /** Streaming twin of [[cmsTokenCounts]]: per-event-time-window
    * frequency estimates for the probe tokens over an unbounded doc
    * stream. The watermark evicts closed windows; per live window the
    * state is the 8 KiB cell vector — bounded-state frequency
    * estimation regardless of how many distinct tokens a window sees.
    * Works identically on a batch frame, which is what the spec
    * asserts against.
    */
  def cmsTokenCountsWindowed(docs: DataFrame,
                             probes: Seq[String] = Seq("spark", "merge",
                               "window", "the", "data"),
                             width: String = "1 hour",
                             watermark: String = "2 hours"): DataFrame = {
    val probeCells = probes.map { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 4).map(j =>
        j * 256 + Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16))
    }
    val fold = udaf(new CmsCellsAgg(probeCells),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt))
    def cell(j: Int) =
      (conv(substring(md5(col("token").cast("binary")), 1 + 2 * j, 2),
        16, 10).cast("int") + j * 256).as(s"c$j")
    val toks = docs.withWatermark("ts", watermark)
      .select(col("ts"),
        explode(TextAnalysis.wsTokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .select(col("ts") +: (0 until 4).map(cell): _*)
    toks.groupBy(window(col("ts"), width))
      .agg(fold(col("c0"), col("c1"), col("c2"), col("c3")).as("o"))
      .select(col("window.start").as("ws"), posexplode(col("o.est")))
      .select(col("ws"),
        element_at(array(probes.map(lit): _*), col("pos") + 1).as("token"),
        col("col").as("est"))
  }

  private[pipeline] case class QBracket(q: Int, bucket: Int, lo: Long, hi: Long)
  private[pipeline] case class QHistOut(n_docs: Long, brackets: Seq[QBracket])

  /** The log2-histogram quantile fold as ONE typed aggregation — the
    * third sketch monoid after HLL (max) and CMS (add): state is the
    * 64-cell bucket-count vector (512 bytes per live window), merge
    * is elementwise add, finish replays [[quantileHist]]'s
    * nearest-rank bucket walk exactly ((n·q+99) div 100, minimal
    * bucket whose cumulative count reaches the rank), so brackets
    * match the batch sketch on the same rows.
    */
  private[pipeline] class QuantHistAgg(qs: Seq[Int])
      extends org.apache.spark.sql.expressions
        .Aggregator[Int, Array[Byte], QHistOut]
      with Serializable {
    import LongVec.{get, put}
    override def zero: Array[Byte] = new Array[Byte](512)
    override def reduce(b: Array[Byte], bucket: Int): Array[Byte] = {
      put(b, bucket, get(b, bucket) + 1L)
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      LongVec.addInto(x, y, 64)
    override def finish(b: Array[Byte]): QHistOut = {
      var n = 0L
      var i = 0
      while (i < 64) { n += get(b, i); i += 1 }
      val brackets = qs.map { q =>
        val rank = (n * q + 99) / 100
        var cum = 0L; var bkt = -1; var j = 0
        while (j < 64 && bkt < 0) {
          cum += get(b, j)
          if (cum >= rank) bkt = j
          j += 1
        }
        QBracket(q, bkt, 1L << bkt, (1L << (bkt + 1)) - 1)
      }
      QHistOut(n, brackets)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[QHistOut] =
      org.apache.spark.sql.Encoders.product[QHistOut]
  }

  /** Streaming twin of [[quantileHist]]: per-event-time-window
    * token-count quantile brackets over an unbounded doc stream.
    * Watermark evicts closed windows; 512 bytes of state per live
    * window regardless of corpus size. Works identically on a batch
    * frame, which is what the spec asserts against.
    */
  def quantileHistWindowed(docs: DataFrame, qs: Seq[Int] = Seq(50, 90, 99),
                           width: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    val fold = udaf(new QuantHistAgg(qs),
      org.apache.spark.sql.Encoders.scalaInt)
    val bucket = (length(bin(
      size(TextAnalysis.wsTokens(col("text"))).cast("long"))) - 1).cast("int")
    docs.withWatermark("ts", watermark)
      .select(col("ts"), bucket.as("b"))
      .groupBy(window(col("ts"), width))
      .agg(fold(col("b")).as("o"))
      .select(col("window.start").as("ws"), col("o.n_docs").as("n_docs"),
        explode(col("o.brackets")).as("br"))
      .select(col("ws"), col("br.q").as("q"), col("br.bucket").as("bucket"),
        col("br.lo").as("lo"), col("br.hi").as("hi"), col("n_docs"))
  }

  /** Streaming twin of [[hllNgramDistinctBy]]: per-(event-time
    * window, group) distinct-gram estimates over an unbounded doc
    * stream. The watermark evicts closed windows from the state
    * store, and per live (window, group) the state is just the
    * 256-byte register vector — per-source distinct tracking on an
    * unbounded corpus with state that never grows with cardinality.
    * Works identically on a batch frame (window + group aggregation),
    * which is what the spec asserts against.
    */
  def hllNgramDistinctByWindowed(docs: DataFrame, groupCol: String = "source",
                                 n: Int = 5, width: String = "1 hour",
                                 watermark: String = "2 hours"): DataFrame = {
    val (r, rho) = registerRho(col("hx"))
    val hllFold = udaf(HllRegistersAgg,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt))
    val grams =
      gramDigests(docs.withWatermark("ts", watermark), n, Seq(groupCol, "ts"))
        .select(col(groupCol), col("ts"), r.as("r"), rho.cast("int").as("rho"))
    val folded = grams
      .groupBy(window(col("ts"), width), col(groupCol))
      .agg(hllFold(col("r"), col("rho")).as("h"))
      .select(col("window.start").as("ws"), col(groupCol),
        col("h.n_present").as("n_present"), col("h.fp").as("fp"))
    estimated(folded, Seq("ws", groupCol))
  }
}
