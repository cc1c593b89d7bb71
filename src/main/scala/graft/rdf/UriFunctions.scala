package graft.rdf

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IRI helper column expressions — Spark-native counterparts of the
  * reference's procedures getIRILocalName / getIRINamespace
  * (reference: pidb-rdf-import/src/main/java/semantics/RDFImport.java:189-194,
  * which split on the last '#' or '/'; we additionally treat ':' as a
  * separator so prefixed names split the same way).
  *
  * Pure `regexp_extract` so both stay inside whole-stage codegen.
  */
object UriFunctions {

  /** Everything after the last '#', '/' or ':' of the IRI. */
  def localName(iri: Column): Column =
    regexp_extract(iri, "([^#/:]*)$", 1)

  /** Everything up to and including the last '#', '/' or ':'. */
  def namespace(iri: Column): Column =
    regexp_extract(iri, "^(.*[#/:])", 1)
}
