package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-graph view derived from the triple relation — the
  * Spark-first counterpart of the reference's statement loader, which
  * materializes literals as node properties, rdf:type as labels, and
  * IRI-object triples as deduplicated relationships
  * (reference: pidb-rdf-import/src/main/java/semantics/DirectStatementLoader.java:156-182).
  *
  * Where the reference mutates a node store statement-at-a-time, this
  * is two declarative aggregations over the triple table — both plain
  * shuffles on `s` that scale linearly and co-locate with any
  * subject-bucketed layout.
  */
object PropertyGraph {

  /** Nodes: uri, sorted label array, lexical property map, numeric
    * property map. Multi-valued properties — several literal triples
    * sharing (s, p) — are collapsed to the (lex, num) pair of the
    * MINIMUM lexical value, one value per key, and never an array:
    * the reference keeps all values per property
    * (pidb-rdf-import/src/main/java/semantics/MultiMetaNeo4jTrait.java)
    * and its non-multi loader is last-write-wins, but last-write is
    * order-dependent and meaningless under parallel ingest, so this
    * view chooses the order-free representative; ALL values remain
    * queryable as companion rows in the triple relation itself.
    * Pinned by PropertyGraphSpec's multi-valued test.
    */
  def nodes(triples: DataFrame): DataFrame = {
    val labels = triples
      .filter(col("p") === "rdf:type")
      .groupBy(col("s"))
      .agg(array_sort(collect_set(col("o"))).as("labels"))
    val props = triples
      .filter(!col("o_is_iri"))
      .groupBy(col("s"), col("p"))
      // struct-min keeps (lex, num) from ONE source triple — separate
      // mins could pair the lexical of one value with the numeric of
      // another on multi-valued properties
      .agg(min(struct(col("o"), col("o_num"))).as("m"))
      .select(col("s"), col("p"),
        col("m.o").as("lex"), col("m.o_num").as("num"))
      .groupBy(col("s"))
      .agg(
        map_from_entries(array_sort(collect_list(
          struct(col("p"), col("lex"))))).as("props"),
        map_from_entries(array_sort(collect_list(
          when(col("num").isNotNull, struct(col("p"), col("num")))))).as("props_num"))
    // both sides are keyed (and so co-partitioned) on s
    labels.join(props, Seq("s"), "full_outer")
      .select(col("s").as("uri"),
        coalesce(col("labels"), array().cast("array<string>")).as("labels"),
        col("props"), col("props_num"))
  }

  /** Edges: deduplicated (src, rel, dst) from IRI-object triples;
    * rdf:type statements become labels, not edges.
    */
  def edges(triples: DataFrame): DataFrame =
    triples
      .filter(col("o_is_iri") && col("p") =!= "rdf:type")
      .select(col("s").as("src"), col("p").as("rel"), col("o").as("dst"))
      .distinct()

  /** The inverse mapping: a property graph (ANY nodes/edges frames,
    * not necessarily RDF-born) serialized back to the triple relation
    * — the reference's /cypher endpoint direction, which exports plain
    * LPG query results as RDF
    * (pidb-rdf-import/src/main/java/semantics/extension/RDFEndpoint.java:50-99).
    * Labels become rdf:type, properties become literal triples (with
    * the numeric companion when the property has one), edges become
    * IRI-object triples. Three narrow projections + a union — no
    * shuffle at all; language tags don't exist on LPG properties, so
    * exported literals are plain (the reference's keepLangTag=false
    * behavior).
    */
  def toTriples(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val typeTriples = nodes
      .select(col("uri").as("s"), explode(col("labels")).as("o"))
      .select(col("s"), lit("rdf:type").as("p"), col("o"),
        lit(null).cast("double").as("o_num"), lit(true).as("o_is_iri"),
        lit(null).cast("string").as("lang"))
    val propTriples = nodes
      .select(col("uri").as("s"), col("props_num"),
        explode(col("props")).as(Seq("p", "o")))
      .select(col("s"), col("p"), col("o"),
        element_at(col("props_num"), col("p")).as("o_num"),
        lit(false).as("o_is_iri"), lit(null).cast("string").as("lang"))
    val edgeTriples = edges
      .select(col("src").as("s"), col("rel").as("p"), col("dst").as("o"),
        lit(null).cast("double").as("o_num"), lit(true).as("o_is_iri"),
        lit(null).cast("string").as("lang"))
    typeTriples.unionByName(propTriples).unionByName(edgeTriples)
  }
}
