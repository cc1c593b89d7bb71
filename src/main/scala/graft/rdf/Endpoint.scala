package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Node-lookup endpoint operators — the reference's RDFEndpoint
  * serves describe-a-node and query results in several RDF
  * serializations (reference:
  * pidb-rdf-import/src/main/java/semantics/extension/RDFEndpoint.java:210
  * nodebyuri, :54/:104 format negotiation).
  */
object Endpoint {

  /** DESCRIBE-style node lookup: every triple where `uri` is the
    * subject plus every incoming edge (IRI object = `uri`),
    * direction-tagged. Both arms are equality filters that push down
    * to the (cached or parquet) triple relation scan.
    */
  def describe(triples: DataFrame, uri: String): DataFrame =
    triples.filter(col("s") === uri)
      .withColumn("dir", lit("out"))
      .unionAll(
        triples.filter(col("o_is_iri") && col("o") === uri && col("s") =!= uri)
          .withColumn("dir", lit("in")))

  /** Set-valued DESCRIBE (the `DESCRIBE ?x WHERE { … }` form): every
    * resource in the one-column `targets` frame described at once —
    * two SEMI-JOIN-shaped keyed joins against the triple relation
    * (subject arm, IRI-object arm) instead of [[describe]]'s constant
    * filters, so ten million targets cost two shuffles, not ten
    * million filter scans. The in-arm drops triples whose subject is
    * itself the target (they already ride the out arm, and a
    * duplicate row would double-count self-loops).
    */
  def describeAll(triples: DataFrame, targets: DataFrame): DataFrame = {
    val t = targets.toDF("t").distinct()
    val out = triples.join(t, triples("s") === col("t"))
      .withColumn("dir", lit("out"))
    val in = triples.filter(col("o_is_iri"))
      .join(t, triples("o") === col("t") && triples("s") =!= col("t"))
      .withColumn("dir", lit("in"))
    out.unionAll(in).drop("t")
  }

  /** Serialize a DESCRIBE result in one of the endpoint formats. The
    * response is node-sized (one node's star), so driver-side
    * assembly is the honest shape — bulk export goes through the
    * distributed writers ([[NTriples.write]] etc.).
    */
  def describeAs(triples: DataFrame, uri: String, format: String): String = {
    val d = describe(triples, uri).drop("dir")
    format match {
      case "ntriples" =>
        NTriples.format(d).collect().map(_.getString(0)).sorted.mkString("\n")
      case "turtle" =>
        Turtle.format(d).collect().map(_.getString(0)).mkString("\n")
      case "jsonld" =>
        JsonLd.format(d).collect().map(_.getString(0)).sorted.mkString("\n")
      case "rdfxml" =>
        RdfXml.formatString(d)
      case other =>
        throw new IllegalArgumentException(s"unknown RDF format: $other")
    }
  }
}
