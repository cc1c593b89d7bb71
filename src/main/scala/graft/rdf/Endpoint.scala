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

  /** Targets at or below this count broadcast into both describe
    * arms; above it the arms fall back to shuffled equi-joins. One
    * million single-IRI rows is tens of MB — comfortably inside an
    * executor broadcast budget. Overridable via the
    * `graft.describe.broadcast.max` system property so soaks can
    * force the over-threshold (shuffled) branch on real data without
    * a million-target fixture.
    */
  def describeBroadcastMax: Long =
    sys.props.get("graft.describe.broadcast.max").map(_.toLong)
      .getOrElse(1000000L)

  /** Set-valued DESCRIBE (the `DESCRIBE ?x WHERE { … }` form): every
    * resource in the one-column `targets` frame described at once —
    * two SEMI-JOIN-shaped keyed joins against the triple relation
    * (subject arm, IRI-object arm) instead of [[describe]]'s constant
    * filters, so ten million targets cost two shuffles, not ten
    * million filter scans. The in-arm drops triples whose subject is
    * itself the target (they already ride the out arm, and a
    * duplicate row would double-count self-loops).
    *
    * The target set is PRICED before planning (the priced-gate idiom
    * the graph wedge joins use): it is checkpointed once — both arms
    * reuse the materialized set instead of re-deriving its WHERE
    * pattern — counted, and BROADCAST when at most
    * [[describeBroadcastMax]] rows. Without the explicit hint,
    * Catalyst's size estimate for a pattern-derived target frame
    * tracks the STORE's size, so at scale it either broadcast the
    * whole triple relation (BuildLeft — the sf1 soak measured 231 s
    * and JVM-wide GC pressure) or shuffled both arms; the result is
    * identical on both sides of the gate, so correctness keys replay
    * it for free.
    */
  def describeAll(triples: DataFrame, targets: DataFrame): DataFrame = {
    val t = graft.Checkpoints.tracked(targets.toDF("t").distinct())
    val tj = if (t.count() <= describeBroadcastMax) broadcast(t) else t
    val out = triples.join(tj, triples("s") === col("t"))
      .withColumn("dir", lit("out"))
    val in = triples.filter(col("o_is_iri"))
      .join(tj, triples("o") === col("t") && triples("s") =!= col("t"))
      .withColumn("dir", lit("in"))
    out.unionAll(in).drop("t")
  }

  /** Serialize a DESCRIBE result in one of the endpoint formats. The
    * response is node-sized (one node's star), so driver-side
    * assembly is the honest shape — bulk export goes through the
    * distributed writers ([[NTriples.write]] etc.).
    */
  def describeAs(triples: DataFrame, uri: String, format: String): String = {
    // priced once at the triple level: the formatted unit varies per
    // format (Turtle folds a subject star into one line), so the
    // line-level collect bound alone is not a memory bound
    val d = FormatGuard.assertBounded(
      describe(triples, uri).drop("dir"), s"describeAs($format)")
    format match {
      case "ntriples" =>
        FormatGuard.collectBounded(NTriples.format(d), "describeAs(ntriples)")
          .map(_.getString(0)).sorted.mkString("\n")
      case "turtle" =>
        FormatGuard.collectBounded(Turtle.format(d), "describeAs(turtle)")
          .map(_.getString(0)).mkString("\n")
      case "jsonld" =>
        FormatGuard.collectBounded(JsonLd.format(d), "describeAs(jsonld)")
          .map(_.getString(0)).sorted.mkString("\n")
      case "rdfxml" =>
        RdfXml.formatString(d)
      case other =>
        throw new IllegalArgumentException(s"unknown RDF format: $other")
    }
  }
}
