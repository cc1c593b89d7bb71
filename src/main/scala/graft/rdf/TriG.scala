package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TriG-subset reader/writer — named graphs (quads). The reference
  * imports TriG through RDF4J (reference:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:46); here
  * the quad relation is the triple relation plus a leading graph
  * column `g`.
  *
  * Subset: one `<graph> { <s> <p> obj . }` statement per line
  * (`GRAPH <g> { … }` also accepted on input; bare triple lines land
  * in the default graph ""). One statement per line keeps TriG as
  * line-splittable as the N-Triples path, so parsing stays an
  * embarrassingly parallel scan at any corpus size.
  */
object TriG {

  /** Quad relation (g + triple columns) → DataFrame("line"). */
  def format(quads: DataFrame): DataFrame =
    NTriples.format(quads)
      .select(concat(lit("<"), col("g"), lit("> { "), col("line"), lit(" }"))
        .as("line"))

  /** DataFrame("line") → quad relation. The graph wrapper peels off
    * with the same substring arithmetic as the triple terms; the
    * inner statement reuses [[NTriples.parse]] with the graph column
    * passed through.
    *
    * `barrier` is an optional plan split between the graph unwrap and
    * the inner triple parse: fused, the two stages' generated code
    * crosses janino's 64 KB method limit and the stage silently runs
    * interpreted (plus a compile-fail penalty). Callers that care
    * pass a materializer (e.g. [[graft.Checkpoints.tracked]]); the
    * default keeps parse a single narrow pass.
    */
  def parse(lines: DataFrame,
            barrier: DataFrame => DataFrame = identity): DataFrame = {
    val l = regexp_replace(trim(col("line")), "^GRAPH[ \\t]+", "")
    val quads = lines.select(l.as("line"))
      .filter(col("line").endsWith("}") && instr(col("line"), "{") > 0)
    val inner = trim(regexp_replace(
      col("line").substr(instr(col("line"), "{") + lit(1), length(col("line"))),
      "\\}$", ""))
    val g = substring_index(substring_index(col("line"), ">", 1), "<", -1)
    val defaults = lines.select(trim(col("line")).as("line"))
      .filter(!col("line").endsWith("}"))
      .select(lit("").as("g"), col("line"))
    NTriples.parse(barrier(
      quads.select(g.as("g"), inner.as("line")).unionAll(defaults)))
  }
}
