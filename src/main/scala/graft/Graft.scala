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

  /** The cached canonical triple relation for a test-data directory. */
  def triples(spark: SparkSession, sfDir: String): DataFrame =
    TripleStore.triples(spark, sfDir)

  /** Run a textual SPARQL SELECT against the triple relation. */
  def sparql(spark: SparkSession, sfDir: String, query: String): DataFrame =
    sparql(triples(spark, sfDir), query)

  /** Run a textual SPARQL SELECT against any triple relation. */
  def sparql(triples: DataFrame, query: String): DataFrame =
    Compiler.run(triples, SparqlParser.parse(query))

  def importNTriples(spark: SparkSession, path: String): DataFrame =
    NTriples.read(spark, path)

  def exportNTriples(triples: DataFrame, path: String): Unit =
    NTriples.write(triples, path)

  def importTurtle(spark: SparkSession, lines: DataFrame): DataFrame =
    Turtle.parse(spark, lines)

  def importJsonLd(spark: SparkSession, lines: DataFrame): DataFrame =
    JsonLd.parse(spark, lines)

  /** DirectStatementLoader semantics: (nodes, edges). */
  def propertyGraph(triples: DataFrame): (DataFrame, DataFrame) =
    (PropertyGraph.nodes(triples), PropertyGraph.edges(triples))
}
