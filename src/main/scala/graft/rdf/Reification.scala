package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDF reification (RDF 1.1 §5.3): each statement becomes a resource
  * carrying rdf:subject / rdf:predicate / rdf:object — the classic
  * store feature for statement-level provenance and annotation
  * (the shape the reference's property-graph edges would round-trip
  * through when edge properties must survive an RDF export).
  *
  * The statement IRI is content-derived (md5 of the canonical
  * `s|p|o` string), so reification is deterministic and idempotent —
  * re-reifying the same graph yields the same resources, and two
  * stores reify to identical IRIs with no coordination (the property
  * that matters when 1000 executors reify shards independently).
  *
  * One pass: each input triple explodes into its four reification
  * triples in-task (explode of a 4-element literal array — narrow,
  * codegen-friendly, no join, no shuffle).
  */
object Reification {

  /** (s, p, o) → four reification triples per statement. */
  def reify(triples: DataFrame): DataFrame = {
    val stmt = concat(lit("stmt:"),
      md5(concat_ws("|", col("s"), col("p"), col("o")).cast("binary")))
    triples
      .select(stmt.as("stmt"), col("s"), col("p"), col("o"))
      .select(explode(array(
        struct(col("stmt").as("rs"), lit("rdf:type").as("rp"),
          lit("rdf:Statement").as("ro")),
        struct(col("stmt").as("rs"), lit("rdf:subject").as("rp"),
          col("s").as("ro")),
        struct(col("stmt").as("rs"), lit("rdf:predicate").as("rp"),
          col("p").as("ro")),
        struct(col("stmt").as("rs"), lit("rdf:object").as("rp"),
          col("o").as("ro")))).as("r"))
      .select(col("r.rs").as("s"), col("r.rp").as("p"), col("r.ro").as("o"))
  }
}
