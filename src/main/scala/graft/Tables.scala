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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
