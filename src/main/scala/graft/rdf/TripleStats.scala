package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-predicate statistics for a registered triple relation —
  * the ANALYZE-TABLE analogue the SPARQL compiler's join ordering
  * reads (triple count, distinct subjects, distinct objects per
  * predicate; vocabulary-sized, so collecting it to the driver is
  * metadata-scale even at 100 TB).
  *
  * Design: [[TripleStore]] registers every relation it serves (the
  * cached base view and its dimension/partitioned/bucketed layouts);
  * the profile is computed LAZILY on the first multi-pattern BGP
  * compile against that relation and memoized, so the store build
  * itself never pays the pass and every later compile reads a map.
  * Unregistered frames (update slices, ad-hoc test frames) simply
  * return None and the compiler keeps its static bound-term
  * heuristic — stats are an accelerator, never a correctness
  * dependency.
  *
  * Spark-first counterpart of a cost-based optimizer's catalog
  * statistics: the reference compiles triple patterns in syntactic
  * order (reference: pidb-rdf-engine/src/main/java/sparql/
  * SparqlToGremlinCompiler.java:241-296); at 100× scale, joining a
  * rare predicate's slice before a hot one is the difference between
  * a ~|rare| intermediate and a ~|hot| one.
  */
object TripleStats {

  /** Per-predicate profile: triple count, distinct subject count,
    * distinct object count.
    */
  final case class PredStat(n: Long, nSubjects: Long, nObjects: Long)

  // weak identity keys (Dataset does not override equals): entries
  // die with the registered frame — which TripleStore caches for the
  // session's lifetime — so no session outlives its stats
  private val registry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Memo]())

  // the memo holds its frame WEAKLY: a strong value→key reference
  // inside a WeakHashMap would pin the entry forever (the classic
  // leak); a cleared referent just means no stats
  private final class Memo(df0: DataFrame,
      pre: Option[Map[String, PredStat]] = None) {
    private val ref = new java.lang.ref.WeakReference(df0)
    lazy val stats: Map[String, PredStat] = pre.getOrElse(
      Option(ref.get()) match {
        case None => Map.empty
        case Some(df) =>
          profile(df).collect()
            .map(r => r.getString(0) ->
              PredStat(r.getLong(1), r.getLong(2), r.getLong(3)))
            .toMap
      })
    lazy val total: Long = stats.valuesIterator.map(_.n).sum
  }

  /** The profile as a relation — the ANALYZE pass itself. */
  def profile(df: DataFrame): DataFrame =
    df.groupBy(col("p"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("s")).as("ns"),
        approx_count_distinct(col("o")).as("no"))

  /** Register a triple relation for lazy profiling; returns it. */
  def register(df: DataFrame): DataFrame = {
    registry.putIfAbsent(df, new Memo(df))
    df
  }

  /** Register with a PRECOMPUTED profile (loaded from the sidecar a
    * layout write persisted): no scan ever runs against this frame —
    * the 100 TB posture, where a new session's first compile must not
    * pay an ANALYZE pass the writer already paid.
    */
  def registerPrecomputed(df: DataFrame,
                          stats: Map[String, PredStat]): DataFrame = {
    registry.put(df, new Memo(df, Some(stats)))
    df
  }

  /** The sidecar directory name — underscore-prefixed, so Spark's
    * file index treats it as hidden and partition discovery over the
    * layout never sees it.
    */
  val SIDECAR = "_predicate_stats"

  /** Persist the profile beside a written layout. */
  def persist(triples: DataFrame, layoutPath: String): Unit =
    profile(triples).coalesce(1)
      .write.mode("overwrite").parquet(s"$layoutPath/$SIDECAR")

  /** Load a persisted profile, or None when the sidecar is absent or
    * unreadable (stats are an accelerator, never a dependency).
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           layoutPath: String): Option[Map[String, PredStat]] =
    try {
      Some(spark.read.parquet(s"$layoutPath/$SIDECAR").collect()
        .map(r => r.getString(0) ->
          PredStat(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap)
    } catch { case _: Exception => None }

  /** The memoized profile of a registered frame (computing it on
    * first use), or None for unregistered frames.
    */
  def forFrame(df: DataFrame): Option[Map[String, PredStat]] =
    Option(registry.get(df)).map(_.stats)

  /** Total triple count of a registered frame (for variable-predicate
    * pattern estimates), or None.
    */
  def totalOf(df: DataFrame): Option[Long] =
    Option(registry.get(df)).map(_.total)
}
