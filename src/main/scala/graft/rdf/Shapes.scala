package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHACL-style shape validation and schema profiling over a triple
  * relation — the data-quality passes a production RDF store runs
  * before publishing (the W3C SHACL core cardinality constraints are
  * the public spec; the reference's import pipeline assumes clean
  * dimension data and has no checker, which is exactly why a user
  * needs one).
  *
  * Scale shape: both operators are keyed aggregations over (s, p) —
  * fact-scale shuffles that partial-aggregate map-side — plus a
  * broadcast ontology-sized shape table. No windows over unbounded
  * groups, no collects.
  */
object Shapes {

  /** Per-predicate cardinality profile: triple count, distinct
    * subjects/objects, max per-subject fanout, and the functionality
    * flag (max fanout 1 ⇔ the predicate could be declared
    * owl:FunctionalProperty) — the schema-discovery pass that tells
    * an ontology engineer what the data actually supports. Two-level
    * aggregation: per-(p, s) counts fold map-side, the per-p rollup
    * is metadata-scale.
    */
  def cardinalityProfile(triples: DataFrame): DataFrame =
    triples.groupBy(col("p"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("c")).as("n_triples"),
        max(col("c")).as("max_fanout"))
      .withColumn("is_functional", col("max_fanout") === 1)

  /** Predicate co-occurrence matrix over subjects: for each unordered
    * predicate pair, how many subjects carry BOTH — the
    * schema-discovery companion of [[cardinalityProfile]] (which
    * predicates form an entity shape TOGETHER, the signal a class
    * inference or SHACL-shape proposal starts from). Subject-keyed
    * self-join over the distinct (s, p) relation: per-subject
    * predicate sets are vocabulary-bounded, so the pair volume is
    * |S|·k² with tiny k — linear in subjects (r11).
    */
  def predCooccurrence(triples: DataFrame): DataFrame = {
    val sp = triples.select(col("s"), col("p")).distinct()
    sp.as("a").join(sp.as("b"),
        col("a.s") === col("b.s") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n_subjects"))
  }

  /** Validate min/max-cardinality shapes: each shape row targets a
    * class and requires between minCount and maxCount values of
    * `path` per target node. Returns the per-shape conformance
    * report (n_targets, n_conforming, n_violations) — the SHACL
    * validation-report summary. Targets missing the path entirely
    * count 0 (the LEFT join), so minCount ≥ 1 shapes catch absent
    * properties.
    */
  def validate(spark: SparkSession, triples: DataFrame,
               shapes: Seq[(String, String, String, Int, Int)]): DataFrame = {
    val sh = broadcast(spark.createDataFrame(shapes)
      .toDF("shape", "target_class", "path", "min_count", "max_count"))
    val targets = triples.filter(col("p") === "rdf:type")
      .select(col("s").as("node"), col("o").as("target_class"))
      .join(sh, "target_class")
    val pathCounts = triples.groupBy(col("s"), col("p"))
      .agg(count(lit(1)).as("cnt"))
    targets.join(pathCounts,
        targets("node") === pathCounts("s") && col("path") === col("p"),
        "left_outer")
      .withColumn("ok",
        coalesce(col("cnt"), lit(0L)).between(col("min_count"), col("max_count")))
      .groupBy(col("shape"), col("target_class"), col("path"),
        col("min_count"), col("max_count"))
      .agg(count(lit(1)).as("n_targets"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_conforming"))
      .withColumn("n_violations", col("n_targets") - col("n_conforming"))
  }
}
