package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Quads reader/writer — the line-splittable quad interchange
  * format (one `s p o [g] .` statement per line; a statement without
  * a graph label belongs to the default graph, stored as g = "").
  * Complements TriG (reference ingests quad formats through RDF4J:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:46): TriG
  * carries the graph as a block wrapper, N-Quads as a fourth term,
  * and both parse as embarrassingly parallel line scans at any
  * corpus size.
  */
object NQuads {

  /** Quad relation (g + triple columns) → DataFrame("line"). The
    * triple body formats through [[NTriples.format]]; a non-default
    * graph splices in as the fourth term before the terminating dot.
    */
  def format(quads: DataFrame): DataFrame =
    NTriples.format(quads).select(
      when(col("g") === "", col("line"))
        .otherwise(concat(
          col("line").substr(lit(1), length(col("line")) - 2),
          lit(" <"), col("g"), lit("> ."))).as("line"))

  /** DataFrame("line") → quad relation. The only parsing question
    * N-Quads adds over N-Triples is whether the statement's last term
    * is a graph label or the object of a 3-term statement. The last
    * whitespace-separated token is the graph iff it is a pure
    * `<iri>` (no quote — a literal's `^^<datatype>` tail carries one)
    * AND at least three terms precede it (subject and predicate alone
    * mean the token is the object). Everything else delegates to
    * [[NTriples.parse]] with the graph column passed through.
    *
    * Raw tabs cannot occur inside a well-formed literal (the writer
    * escapes them as \t), so normalizing separators to single spaces
    * before the token split is exact.
    *
    * `barrier` splits the plan between the quad unwrap and the inner
    * triple parse, exactly like [[TriG.parse]]'s: fused, the two
    * stages' generated code crosses janino's 64 KB method limit and
    * the stage silently runs interpreted (plus a compile-fail
    * penalty). Callers that care pass a materializer (e.g.
    * [[graft.Checkpoints.tracked]]); the default keeps parse a single
    * narrow pass.
    */
  def parse(lines: DataFrame,
            barrier: DataFrame => DataFrame = identity): DataFrame = {
    val prepared = lines
      .select(trim(col("line")).as("raw"))
      .filter(col("raw").endsWith("."))
      .withColumn("stmt",
        rtrim(regexp_replace(regexp_replace(col("raw"), "\t", " "),
          " *\\.$", "")))
      .withColumn("cand", substring_index(col("stmt"), " ", -1))
      .withColumn("pre",
        rtrim(col("stmt").substr(lit(1),
          length(col("stmt")) - length(col("cand")))))
      .withColumn("hasg",
        col("cand").startsWith("<") && col("cand").endsWith(">") &&
          !col("cand").contains("\"") &&
          size(split(col("pre"), " +")) >= 3)
    NTriples.parse(barrier(prepared.select(
      when(col("hasg"), col("cand").substr(lit(2), length(col("cand")) - 2))
        .otherwise(lit("")).as("g"),
      concat(when(col("hasg"), col("pre")).otherwise(col("stmt")),
        lit(" .")).as("line"))))
  }

  /** Write quads as N-Quads text files (one line per quad). */
  def write(quads: DataFrame, path: String): Unit =
    format(quads).write.mode("overwrite").text(path)

  /** Read N-Quads text files back into the quad relation. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))
}
