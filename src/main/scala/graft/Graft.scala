package graft

import graft.rdf._
import graft.sparql.{Compiler, SparqlParser}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The user-facing facade — everything a pidb-rdf user does, one call
  * away on Spark:
  *
  * {{{
  * val t   = Graft.triples(spark, dataDir)          // the RDF view
  * val df  = Graft.sparql(spark, dataDir,
  *   "SELECT ?c ?b WHERE { ?c a :Customer ; :acctbal ?b . FILTER(?b > 9000) }")
  * Graft.exportNTriples(t, "/out/nt")               // serialization
  * val t2  = Graft.importNTriples(spark, "/out/nt") // parallel ingest
  * val (nodes, edges) = Graft.propertyGraph(t)      // loader semantics
  * }}}
  */
object Graft {

  /** Register graft's native SQL functions (`cosine_sim`, `dot_int`,
    * `bloom_contains`) on a session, so textual SQL reaches the fused
    * codegen kernels.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.DotProductInt.register(spark)
    graft.functions.BloomContains.register(spark)
  }

  /** The cached canonical triple relation for a test-data directory. */
  def triples(spark: SparkSession, sfDir: String): DataFrame =
    TripleStore.triples(spark, sfDir)

  /** Run a textual SPARQL SELECT against the triple relation. */
  def sparql(spark: SparkSession, sfDir: String, query: String): DataFrame =
    sparql(triples(spark, sfDir), query)

  /** Run a textual SPARQL SELECT against any triple relation. */
  def sparql(triples: DataFrame, query: String): DataFrame =
    Compiler.run(triples, SparqlParser.parse(query))

  /** Run a textual SPARQL SELECT against a quad (named-graph)
    * relation — GRAPH groups scope to / bind the graph term; patterns
    * outside GRAPH match the union default graph.
    */
  def sparqlQuads(quads: DataFrame, query: String): DataFrame =
    Compiler.runQuads(quads, SparqlParser.parse(query))

  /** Dispatch a textual query on its form — SELECT / ASK / CONSTRUCT /
    * DESCRIBE, the reference endpoint's full query surface. The form
    * keyword is located outside IRI brackets, so a namespace like
    * `<http://x/select>` in the prologue can't misroute.
    */
  def query(triples: DataFrame, text: String): DataFrame = {
    val scrubbed = text.replaceAll("<[^<>]*>", "<>")
    "(?i)\\b(SELECT|ASK|CONSTRUCT|DESCRIBE)\\b".r
      .findFirstMatchIn(scrubbed).map(_.group(1).toUpperCase) match {
      case Some("SELECT") => sparql(triples, text)
      case Some("ASK") => Compiler.ask(triples, SparqlParser.parseAsk(text))
      case Some("CONSTRUCT") =>
        val (tmpl, where) = SparqlParser.parseConstruct(text)
        Compiler.construct(triples, tmpl, where)
      case Some("DESCRIBE") =>
        // full §16.4 grammar: VarOrIri+ with optional WHERE (r12)
        val (targets, where) = SparqlParser.parseDescribeQuery(text)
        graft.sparql.Compiler.describe(triples, targets, where)
      case _ => throw new IllegalArgumentException(
        "query must be SELECT, ASK, CONSTRUCT or DESCRIBE")
    }
  }

  /** Apply a textual SPARQL Update (INSERT DATA / DELETE DATA /
    * DELETE WHERE) to a triple relation, returning the derived store.
    */
  def update(triples: DataFrame, text: String): DataFrame =
    graft.sparql.Update(triples, SparqlParser.parseUpdate(text))

  /** Apply a textual SPARQL Update to a quad (named-graph) relation —
    * the §3.2 graph-management forms (CLEAR / DROP / CREATE / COPY /
    * MOVE / ADD) land here, returning the derived quad set.
    */
  def updateQuads(quads: DataFrame, text: String): DataFrame =
    graft.sparql.Update.applyQuads(quads, SparqlParser.parseUpdate(text))

  def importNTriples(spark: SparkSession, path: String): DataFrame =
    NTriples.read(spark, path)

  def exportNTriples(triples: DataFrame, path: String): Unit =
    NTriples.write(triples, path)

  /** Quad (named-graph) interchange: N-Quads files. */
  def importNQuads(spark: SparkSession, path: String): DataFrame =
    NQuads.read(spark, path)

  def exportNQuads(quads: DataFrame, path: String): Unit =
    NQuads.write(quads, path)

  def importTurtle(spark: SparkSession, lines: DataFrame): DataFrame =
    Turtle.parse(spark, lines)

  def importJsonLd(spark: SparkSession, lines: DataFrame): DataFrame =
    JsonLd.parse(spark, lines)

  /** DirectStatementLoader semantics: (nodes, edges). */
  def propertyGraph(triples: DataFrame): (DataFrame, DataFrame) =
    (PropertyGraph.nodes(triples), PropertyGraph.edges(triples))
}
