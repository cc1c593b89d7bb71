package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed N-Triples serialization and parsing.
  *
  * N-Triples is one-triple-per-line, which makes it the 100 TB-safe
  * interchange format: files split on line boundaries, so both the
  * writer and the parser are embarrassingly parallel scans — unlike
  * the reference, which streams every statement through a single
  * RDF4J parser thread (reference:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:50-155).
  *
  * Everything here is built from codegen'd `functions._` expressions
  * (no UDFs): format is concat/when, parse is regexp_extract.
  */
object NTriples {

  private val XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

  /** Backslash-escape per N-Triples rules. Order matters: backslash
    * first so introduced escapes are not re-escaped.
    */
  private[rdf] def esc(c: Column): Column = {
    val steps = Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"",
      "\n" -> "\\\\n", "\r" -> "\\\\r", "\t" -> "\\\\t")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }

  /** Inverse of esc. Simple escapes only (matches what esc emits). */
  private def unesc(c: Column): Column =
    Seq("\\\\n" -> "\n", "\\\\r" -> "\r", "\\\\t" -> "\t",
      "\\\\\"" -> "\"", "\\\\\\\\" -> "\\\\")
      .foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, from, to)
      }

  /** Triple relation → DataFrame("line": one N-Triples line each). */
  def format(triples: DataFrame): DataFrame = {
    val obj = when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
      .when(col("lang").isNotNull,
        concat(lit("\""), esc(col("o")), lit("\"@"), col("lang")))
      .when(col("o_num").isNotNull,
        concat(lit("\""), esc(col("o")), lit("\"^^<" + XSD_DOUBLE + ">")))
      .otherwise(concat(lit("\""), esc(col("o")), lit("\"")))
    triples.select(concat(
      lit("<"), col("s"), lit("> <"), col("p"), lit("> "), obj, lit(" .")
    ).as("line"))
  }

  /** DataFrame with a "line" column → triple relation. Blank lines and
    * '#' comments are dropped; malformed lines are dropped too (the
    * subject regex fails ⇒ empty string filtered out).
    */
  def parse(lines: DataFrame): DataFrame = {
    val l = trim(col("line"))
    val body = lines
      .filter(l =!= "" && !l.startsWith("#"))
      .select(
        regexp_extract(l, "^<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.$", 1).as("s"),
        regexp_extract(l, "^<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.$", 2).as("p"),
        regexp_extract(l, "^<([^>]*)>\\s+<([^>]*)>\\s+(.*?)\\s*\\.$", 3).as("obj"))
      .filter(col("s") =!= "")
    val isIri = col("obj").startsWith("<")
    val lex = regexp_extract(col("obj"), "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1)
    val langTag = regexp_extract(col("obj"), "\"@([A-Za-z][A-Za-z0-9-]*)$", 1)
    val dtype = regexp_extract(col("obj"), "\\^\\^<([^>]*)>$", 1)
    body.select(
      col("s"),
      col("p"),
      when(isIri, regexp_extract(col("obj"), "^<([^>]*)>", 1))
        .otherwise(unesc(lex)).as("o"),
      when(!isIri && dtype === XSD_DOUBLE, unesc(lex).cast("double"))
        .otherwise(lit(null).cast("double")).as("o_num"),
      isIri.as("o_is_iri"),
      when(!isIri && langTag =!= "", langTag)
        .otherwise(lit(null).cast("string")).as("lang"))
  }

  /** Write triples as N-Triples text files (one line per triple). */
  def write(triples: DataFrame, path: String): Unit =
    format(triples).write.mode("overwrite").text(path)

  /** Read N-Triples text files back into the triple relation. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))
}
