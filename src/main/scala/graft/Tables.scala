package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Reads stay plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom; at cluster scale the same paths would be
  * table identifiers with partitioned layouts, nothing here assumes
  * local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Parse a Spark byte-size conf value ("8m", "134217728", "1g"). */
  private def parseBytes(v: String): Long = {
    val s = v.trim.toLowerCase
    val (num, mult) =
      if (s.endsWith("k")) (s.dropRight(1), 1L << 10)
      else if (s.endsWith("m")) (s.dropRight(1), 1L << 20)
      else if (s.endsWith("g")) (s.dropRight(1), 1L << 30)
      else if (s.endsWith("b")) (s.dropRight(1), 1L)
      else (s, 1L)
    (num.toDouble * mult).toLong
  }

  /** Widen degenerate scans (optimization guide §2.5, "input skew: one
    * huge unsplittable file"): the driver's test tables are
    * SINGLE-ROW-GROUP parquet files, so no `maxPartitionBytes` setting
    * can split their scan below one task — and every per-row expression
    * chain evaluated in the scan stage (the 9-way triple explode, gram
    * md5 transforms, shingle arrays) runs SERIAL on one core while the
    * other 31 idle (observed: a 100 s single-task md5 stage on an
    * otherwise 95 %-idle box). When the file cannot fill the session's
    * cores at the configured split size, round-robin repartition right
    * after the read — one shuffle of the (tiny, by the same condition)
    * source rows buys full map-side parallelism for everything above.
    *
    * Scale posture: on a cluster layout (multi-file tables, row groups
    * ≥ cores) `bytes < cores · split` is false and the scan is
    * untouched — this does not tune FOR local mode, it un-tunes a
    * degenerate input layout, adaptively to the session's actual core
    * count and split size. Files under 64 KB (broadcast-scale dims)
    * skip the spread: scheduling 32 tasks over 25 rows costs more than
    * it buys. Results cannot move: every operator in this repo is
    * partition-order-safe by construction (sorted collects, min-based
    * SAMPLE, md5-keyed tie-breaks), re-verified against the DuckDB
    * oracle after this change.
    */
  private[graft] def spread(spark: SparkSession, df: DataFrame,
                            path: String): DataFrame = {
    val bytes = try new java.io.File(path).length() catch { case _: Throwable => 0L }
    if (bytes < 65536) return df // non-local path (0) or broadcast-scale dim
    val split = try parseBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    catch { case _: Throwable => 134217728L }
    val cores = spark.sparkContext.defaultParallelism
    if (bytes < split.min(Int.MaxValue.toLong) * cores) df.repartition(cores)
    else df
  }

  /** Tables whose every declared consumer is partition-order-safe
    * (integer-exact arithmetic, md5-keyed choices, sorted collects, or
    * float sums rounded well inside reassociation drift) — the §G/§H/§I
    * pipeline operators were BUILT that way. The relational TPC-H
    * anchors, by contrast, sum raw doubles (q1's sum_disc_price etc.)
    * whose 10-digit agreement with the oracle depends on file-order
    * summation, so their sources (lineitem, orders, customer, part,
    * supplier) must NOT be re-ordered here — the RDF store build spreads
    * those itself ([[graft.rdf.RdfModel]]), where every downstream
    * aggregate is audited order-safe.
    */
  // embeddings and events deliberately NOT spread (r19 measured):
  // embeddings is row-few (binary vector payloads make file bytes a
  // poor proxy for rows/work) and spreading its 2 000 rows over 32
  // partitions cost the ANN keys 30-70 % in tiny-task scheduling;
  // events' map-side work is light (timestamps/ints, no explode or
  // digest) and most of its operators shuffle by user_id immediately,
  // so the spread exchange was pure overhead (+30 % total across the
  // 13 benched events keys). Only documents has the heavy scan-stage
  // expression chains (gram/shingle/window md5 explodes) that the
  // spread exists for.
  private val spreadSafe = Set("documents")

  /** [[spread]] applied to a named table load — for call sites (the
    * store build) whose downstream is order-safe but whose table is
    * not on the [[spreadSafe]] list.
    */
  private[graft] def loadSpread(spark: SparkSession, sfDir: String,
                                name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    spread(spark, spark.read.parquet(path), path)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    if (spreadSafe(name)) spread(spark, df, path) else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read nanos as long and truncate to micros
    * (integer division — a double division would lose precision at
    * 1e18 nanos). DuckDB's reader truncates to micros the same way.
    *
    * Deliberately session-wide: the legacy flag is consulted again at
    * scan execution, so restoring it after load() would break the
    * deferred read. The only nanos table in this schema is events.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    // schema-adaptive: a NANOS parquet reads as LongType under the
    // legacy flag and is truncated to micros here; a MICROS parquet
    // reads as a timestamp already (the flag only touches nanos
    // columns) and must pass through untouched — the generator's
    // precision changed once before, so don't assume either
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        // parquet micros surface as TIMESTAMP_NTZ; the operators use
        // unix_micros/window over TIMESTAMP_LTZ — under the UTC
        // session zone this cast is a wall-clock identity
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
