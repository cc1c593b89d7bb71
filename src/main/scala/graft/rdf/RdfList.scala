package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDF collections (rdf:first / rdf:rest cons chains) → ordered rows.
  * The Turtle `( a b c )` sugar and every OWL construct that takes an
  * ordered argument list (owl:unionOf, owl:intersectionOf,
  * owl:propertyChainAxiom) store THIS shape; a store that cannot
  * unroll it cannot read those axioms back. Reference surface:
  * LiteOntologyImporter skips list-valued axioms entirely — this
  * closes that read path.
  *
  * Scale shape: heads are the cells no rdf:rest points to (one
  * anti-join); each walk round advances every unfinished list one
  * cell — two keyed joins per round, frontier shrinks as lists
  * finish, `localCheckpoint` truncates lineage. Rounds = LONGEST list
  * length, which in real graphs is schema-scale (an axiom's operand
  * list), not data-scale — the documented contract; a pathological
  * million-element list would want the pointer-doubling route
  * instead.
  */
object RdfList {

  /** (head, pos, item) for every well-formed list in the relation. */
  def unroll(triples: DataFrame, maxLen: Int = 1000): DataFrame = {
    val first = triples.filter(col("p") === "rdf:first")
      .select(col("s").as("cell"), col("o").as("item"))
    val rest = triples.filter(col("p") === "rdf:rest")
      .select(col("s").as("cell"), col("o").as("nxt"))
    val heads = first.select(col("cell"))
      .join(rest.select(col("nxt").as("cell")), Seq("cell"), "left_anti")

    var frontier = heads
      .select(col("cell").as("head"), col("cell"), lit(0).as("pos"))
      .localCheckpoint()
    var out = frontier.join(first, "cell")
      .select(col("head"), col("pos"), col("item")).localCheckpoint()
    var round = 0
    var done = frontier.isEmpty
    while (!done && round < maxLen) {
      val nextF = frontier.join(rest, "cell")
        .filter(col("nxt") =!= "rdf:nil")
        .select(col("head"), col("nxt").as("cell"),
          (col("pos") + 1).as("pos"))
        .localCheckpoint()
      done = nextF.isEmpty
      if (!done) {
        out = out.unionByName(nextF.join(first, "cell")
          .select(col("head"), col("pos"), col("item"))).localCheckpoint()
        frontier = nextF
      }
      round += 1
    }
    out
  }
}
