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

  /** Backslash-escape per N-Triples rules — literal `replace` (no
    * regex). Order matters: backslash first so introduced escapes are
    * not re-escaped.
    */
  private[rdf] def esc(c: Column): Column =
    Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
      "\r" -> "\\r", "\t" -> "\\t")
      .foldLeft(c) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }

  /** Inverse of esc. The escape set of an N-Triples literal is a
    * subset of JSON's string escapes (\\ \" \n \r \t \uXXXX), so the
    * fast path delegates decoding — including Unicode escapes — to
    * the JSON parser. Input that is not JSON-decodable (e.g. a lone
    * \' or an 8-digit \U escape) falls back to a split-on-double-
    * backslash decode of the simple escapes, which is exact for what
    * `esc` emits (splitting first avoids the chained-replace
    * ambiguity where an escaped backslash before 'n' would decode as
    * a newline).
    */
  private def unesc(c: Column): Column = {
    val viaJson = get_json_object(
      concat(lit("{\"v\":\""), c, lit("\"}")), "$.v")
    def seg(s: Column): Column =
      Seq("\\n" -> "\n", "\\r" -> "\r", "\\t" -> "\t", "\\\"" -> "\"")
        .foldLeft(s) { case (acc, (from, to)) =>
          replace(acc, lit(from), lit(to))
        }
    coalesce(viaJson,
      array_join(transform(split(c, "\\\\\\\\", -1), seg(_)), "\\"))
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

  /** DataFrame with a "line" column → triple relation. Blank lines,
    * '#' comments and lines without the `<..> <..> obj .` shape are
    * dropped.
    *
    * Terms slice out with substring arithmetic ('>' is forbidden
    * inside IRIs, so bracket positions are unambiguous); the grammar's
    * one-or-more spaces/tabs between terms are trimmed before each
    * slice, so pretty-printed files parse correctly too.
    */
  def parse(lines: DataFrame): DataFrame = {
    val l = trim(col("line"))
    val body = lines
      .select(l.as("line"))
      .filter(col("line").startsWith("<") && col("line").endsWith("."))
      .select(
        substring_index(substring_index(col("line"), ">", 1), "<", -1).as("s"),
        col("line"))
      .withColumn("rest", regexp_replace(
        col("line").substr(length(col("s")) + lit(3), length(col("line"))),
        "^[ \\t]+", ""))
      .filter(col("rest").startsWith("<"))
      .withColumn("p",
        substring_index(substring_index(col("rest"), ">", 1), "<", -1))
      .withColumn("obj", rtrim(regexp_replace(
        col("rest").substr(length(col("p")) + lit(3), length(col("rest"))),
        "^[ \\t]+", ""), " ."))
      .filter(col("s") =!= "" && col("p") =!= "" && col("obj") =!= "")
      .select(col("s"), col("p"), col("obj"))
    // '"lex"', '"lex"@lang', '"lex"^^<dt>' or '<iri>' — escaped quotes
    // inside the lexical form never end it, so the LAST '"' is the
    // closer and everything slices without regex.
    val isIri = col("obj").startsWith("<")
    val suffix = substring_index(col("obj"), "\"", -1)
    val lex = col("obj").substr(lit(2), length(col("obj")) - length(suffix) - lit(2))
    val langTag = when(suffix.startsWith("@"), suffix.substr(lit(2), length(suffix)))
    val dtype = when(suffix.startsWith("^^<"), suffix.substr(lit(4), length(suffix) - lit(4)))
    body.select(
      col("s"),
      col("p"),
      when(isIri, col("obj").substr(lit(2), length(col("obj")) - lit(2)))
        .otherwise(unesc(lex)).as("o"),
      when(!isIri && dtype === XSD_DOUBLE, unesc(lex).cast("double"))
        .otherwise(lit(null).cast("double")).as("o_num"),
      isIri.as("o_is_iri"),
      when(!isIri && langTag.isNotNull, langTag)
        .otherwise(lit(null).cast("string")).as("lang"))
  }

  /** Write triples as N-Triples text files (one line per triple). */
  def write(triples: DataFrame, path: String): Unit =
    format(triples).write.mode("overwrite").text(path)

  /** Read N-Triples text files back into the triple relation. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))

  /** Streaming ingest (the reference's streamRDF): parse is stateless
    * column expressions, so the same transform runs unchanged under
    * Structured Streaming — new files landing in `path` become new
    * triples incrementally.
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.text(path).withColumnRenamed("value", "line"))
}
