package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-defined schema mappings applied on export — the reference's
  * MappingUtils procedures (reference:
  * pidb-rdf-import/src/main/java/semantics/mapping/MappingUtils.java:76-131:
  * addSchema / addMappingToSchema / dropMapping / listMappings).
  *
  * A mapping set pairs graph element names (the store-canonical
  * predicate/label strings) with public-vocabulary IRIs under
  * registered schemas. The reference keeps them as nodes in the
  * store; here the set is immutable driver-side metadata
  * (ontology-sized by nature) and export application is a broadcast
  * join — the data-side cost is one map-side hash lookup per triple,
  * at any scale.
  */
final case class Mappings(
    schemas: Map[String, String] = Map.empty,          // prefix -> ns IRI
    pairs: Map[String, (String, String)] = Map.empty) { // elem -> (prefix, local)

  /** Register a schema (namespace + prefix). No two prefixes for one
    * namespace and no two namespaces for one prefix — a conflicting
    * registration is a no-op, like the reference's addSchema
    * (MappingUtils.java:21-33).
    */
  def addSchema(prefix: String, ns: String): Mappings =
    if (schemas.contains(prefix) || schemas.values.exists(_ == ns)) this
    else copy(schemas = schemas + (prefix -> ns))

  /** Map a graph element name to `prefix:local` in a registered
    * schema; the schema must exist (same contract as the reference).
    */
  def addMapping(elem: String, prefix: String, local: String): Mappings = {
    require(schemas.contains(prefix), s"unregistered schema prefix: $prefix")
    copy(pairs = pairs + (elem -> ((prefix, local))))
  }

  def dropMapping(elem: String): Mappings = copy(pairs = pairs - elem)

  /** Drop a schema and every mapping under it. */
  def dropSchema(prefix: String): Mappings =
    copy(schemas = schemas - prefix,
      pairs = pairs.filterNot(_._2._1 == prefix))

  /** (elem, target IRI) rows, optionally filtered by a substring of
    * the element name (the reference's listMappings filter).
    */
  def list(spark: SparkSession, filter: String = ""): DataFrame = {
    val rows = pairs.toSeq
      .filter(_._1.contains(filter))
      .map { case (elem, (pfx, local)) => (elem, schemas(pfx) + local) }
      .sortBy(_._1)
    spark.createDataFrame(rows).toDF("elem", "iri")
  }

  /** Rewrite predicates (and IRI objects, which is where rdf:type
    * labels live) to their mapped public IRIs on an export slice;
    * unmapped terms pass through. Broadcast hash join, no shuffle.
    */
  def applyOnExport(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    if (pairs.isEmpty) triples
    else {
      val m = broadcast(list(spark).toDF("__from", "__to"))
      triples
        .join(m, col("p") === col("__from"), "left_outer")
        .withColumn("p", coalesce(col("__to"), col("p")))
        .drop("__from", "__to")
        .join(m, col("o_is_iri") && col("o") === col("__from"), "left_outer")
        .withColumn("o", coalesce(col("__to"), col("o")))
        .drop("__from", "__to")
    }
  }
}

object Mappings {

  /** The reference's addCommonSchemas preset
    * (MappingUtils.java:36-61): well-known public vocabularies
    * pre-registered (the reference also ships a FIBO block; the
    * general-purpose core is what transfers).
    */
  def withCommonSchemas: Mappings = Mappings(schemas = Map(
    "sch" -> "http://schema.org/",
    "dc" -> "http://purl.org/dc/elements/1.1/",
    "dct" -> "http://purl.org/dc/terms/",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#"))
}
