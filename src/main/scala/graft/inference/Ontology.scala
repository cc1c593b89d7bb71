package graft.inference

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static test ontology over the TPC-H-ish RDF vocabulary: a class
  * hierarchy (rdfs:subClassOf, "SCO") and a property hierarchy
  * (rdfs:subPropertyOf, "SPO") — the inputs the reference's
  * micro-reasoners walk transitively (reference:
  * pidb-rdf-import/src/main/java/semantics/inference/MicroReasoners.java:20-22).
  */
object Ontology {

  val SCO = "rdfs:subClassOf"
  val SPO = "rdfs:subPropertyOf"

  /** (sub, sup) direct subclass edges. */
  val subClassOf: Seq[(String, String)] = Seq(
    ":Customer" -> ":Agent",
    ":Supplier" -> ":Agent",
    ":Agent" -> ":LegalEntity",
    ":LegalEntity" -> ":Thing",
    ":Part" -> ":Artifact",
    ":Artifact" -> ":Thing",
    ":Order" -> ":Transaction",
    ":Lineitem" -> ":Transaction",
    ":Transaction" -> ":Thing",
    ":Nation" -> ":Place",
    ":Region" -> ":Place",
    ":Place" -> ":Thing")

  /** (sub, sup) direct subproperty edges. */
  val subPropertyOf: Seq[(String, String)] = Seq(
    ":hasNation" -> ":locatedIn",
    ":inRegion" -> ":locatedIn",
    ":locatedIn" -> ":related",
    ":byCustomer" -> ":involves",
    ":ofPart" -> ":involves",
    ":bySupplier" -> ":involves",
    ":involves" -> ":related",
    ":ofOrder" -> ":partOf",
    ":partOf" -> ":related")

  def subClassDf(spark: SparkSession): DataFrame =
    spark.createDataFrame(subClassOf).toDF("sub", "sup")

  def subPropertyDf(spark: SparkSession): DataFrame =
    spark.createDataFrame(subPropertyOf).toDF("sub", "sup")

  /** The ontology as triples (LiteOntologyImporter's input shape;
    * reference: pidb-rdf-import/src/main/java/semantics/LiteOntologyImporter.java).
    */
  def triples(spark: SparkSession): DataFrame = {
    val rows = subClassOf.map { case (a, b) => (a, SCO, b) } ++
      subPropertyOf.map { case (a, b) => (a, SPO, b) }
    spark.createDataFrame(rows).toDF("s", "p", "o")
  }
}
