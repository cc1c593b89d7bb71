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
    // escape-free fast path first: almost every real-world literal has
    // no backslash, and one instr beats running a JSON decode per row
    // (the parse stage's dominant cost before this guard)
    when(instr(c, "\\") === 0, c)
      .otherwise(coalesce(viaJson,
        array_join(transform(split(c, "\\\\\\\\", -1), seg(_)), "\\")))
  }

  /** Triple relation → DataFrame("line": one N-Triples line each).
    * Blank-node terms (stored with their `_:` prefix, o_is_iri=true —
    * they are resource terms, not literals) serialize bare, per the
    * N-Triples grammar.
    */
  def format(triples: DataFrame): DataFrame = {
    val subj = when(col("s").startsWith("_:"), col("s"))
      .otherwise(concat(lit("<"), col("s"), lit(">")))
    val obj = when(col("o_is_iri") && col("o").startsWith("_:"), col("o"))
      .when(col("o_is_iri"), concat(lit("<"), col("o"), lit(">")))
      // "" is the engine's explicit plain-literal marker (a CONCAT of
      // mixed-tag args) — never a serializable tag
      .when(col("lang").isNotNull && col("lang") =!= "",
        concat(lit("\""), esc(col("o")), lit("\"@"), col("lang")))
      .when(col("o_num").isNotNull,
        concat(lit("\""), esc(col("o")), lit("\"^^<" + XSD_DOUBLE + ">")))
      .otherwise(concat(lit("\""), esc(col("o")), lit("\"")))
    // columns beyond the triple schema (e.g. TriG's graph column)
    // pass through beside the formatted line
    val keep = triples.columns
      .filterNot(Set("s", "p", "o", "o_num", "o_is_iri", "lang")).map(col)
    triples.select(keep :+ concat(
      subj, lit(" <"), col("p"), lit("> "), obj, lit(" .")
    ).as("line"): _*)
  }

  /** Import-QA report: how many input lines parsed, and what happened
    * to the rest? [[parse]] DROPS non-conforming lines by design (an
    * ingest must not abort on one bad row at 100 TB) — but a dropped
    * line must be VISIBLE, or a 2%-malformed feed silently becomes a
    * 2%-smaller graph. One classification pass for the total /
    * blank / comment counts plus the parse itself for the parsed
    * count (the report counts what the REAL parser accepts — no
    * duplicated shape logic to drift); malformed is the exact
    * remainder. Two narrow passes, one-row output.
    */
  def parseReport(lines: DataFrame): DataFrame = {
    val l = trim(col("line"))
    val base = lines.agg(count(lit(1)).as("n_lines"),
      sum(when(l === "", 1L).otherwise(0L)).as("n_blank"),
      sum(when(l.startsWith("#"), 1L).otherwise(0L)).as("n_comment"))
    val parsed = parse(lines).agg(count(lit(1)).as("n_parsed"))
    base.crossJoin(broadcast(parsed))
      .select(col("n_lines"), col("n_blank"), col("n_comment"),
        col("n_parsed"),
        (col("n_lines") - col("n_blank") - col("n_comment") -
          col("n_parsed")).as("n_malformed"))
  }

  /** DataFrame with a "line" column → triple relation. Blank lines,
    * '#' comments and lines without the `subj <pred> obj .` shape are
    * dropped; an object that is neither `<iri>`, `"literal"` nor
    * `_:bnode` drops the line rather than fabricating a literal.
    *
    * Blank-node subjects and objects parse as resource terms with
    * their `_:` prefix kept (reference accepts them via RDF4J,
    * pidb-rdf-import/src/main/java/semantics/RDFImport.java:50-155);
    * `format` serializes them back bare, so round-trips are exact.
    *
    * Terms slice out with substring arithmetic ('>' is forbidden
    * inside IRIs, so bracket positions are unambiguous); the grammar's
    * one-or-more spaces/tabs between terms are trimmed before each
    * slice, so pretty-printed files parse correctly too.
    */
  def parse(lines: DataFrame): DataFrame = {
    // Whole-stage-codegen router: GetJsonObject and the HOF in
    // `unesc`'s fallback are both CodegenFallback expressions, and a
    // single CodegenFallback drops the whole projection out of WSCG —
    // every escape-free line (virtually all of them) then pays
    // interpreted eval, which measured ~4× the entire rest of the
    // parse. A codegen'd backslash test routes lines instead: the
    // escape-free majority parses in one fused WSCG stage where the
    // lexical IS the value, and only lines that actually contain a
    // backslash take the (interpreted, but now tiny) decoding branch.
    val hasEsc = instr(col("line"), "\\") > 0
    parseRoute(lines.filter(hasEsc), decode = true)
      .unionAll(parseRoute(lines.filter(!hasEsc), decode = false))
  }

  private def parseRoute(lines: DataFrame, decode: Boolean): DataFrame = {
    // columns beyond "line" (e.g. TriG's graph column) pass through
    val keep = lines.columns.filterNot(_ == "line").map(col)
    // `_nb` barrier columns: a Project gets codegen subexpression
    // elimination, so inside one projection each derivation chain
    // evaluates once — but a filter conjunct does not (short-circuit
    // semantics), so a conjunct pushed below the projections
    // re-derives the whole trim→s→rest→obj chain per row, which
    // measured ~3× the entire rest of the parse. Each filter
    // therefore carries an always-true predicate on a rand() column:
    // the reference keeps the column from being pruned, its
    // nondeterminism makes the projection unpushable-through, and
    // `>= -1` (unlike isNotNull on a non-nullable expr) survives the
    // optimizer — so the shape checks evaluate against MATERIALIZED
    // columns. rand(), not monotonically_increasing_id: the streaming
    // ingest path reuses this parse, and the streaming checker
    // rejects mid. Both barriers are dropped by the output select.
    val body = lines
      .withColumn("line", trim(col("line")))
      .withColumn("_nb1", rand())
      .filter(col("_nb1") >= -1 &&
        (col("line").startsWith("<") || col("line").startsWith("_:")) &&
        col("line").endsWith("."))
      .withColumn("s",
        when(col("line").startsWith("<"),
          substring_index(substring_index(col("line"), ">", 1), "<", -1))
          .otherwise(regexp_extract(col("line"), "^(_:[^ \\t]+)", 1)))
      // chars consumed by the subject term: <s> for IRIs, bare s for bnodes
      .withColumn("s_end", length(col("s")) +
        when(col("line").startsWith("<"), lit(2)).otherwise(lit(0)))
      // ltrim with an explicit char set replaces a per-line regex —
      // same "one or more spaces/tabs" semantics, no regex engine
      .withColumn("rest", ltrim(
        col("line").substr(col("s_end") + lit(1), length(col("line"))),
        " \t"))
      .withColumn("p",
        substring_index(substring_index(col("rest"), ">", 1), "<", -1))
      .withColumn("obj", rtrim(ltrim(
        col("rest").substr(length(col("p")) + lit(3), length(col("rest"))),
        " \t"), " ."))
      .withColumn("_nb2", rand())
      // `p`/`obj` slice garbage when rest is not `<`-led, but slicing
      // garbage is safe and the row drops right here — evaluating the
      // shape checks on the materialized columns is the whole point
      .filter(col("_nb2") >= -1 &&
        col("rest").startsWith("<") &&
        col("s") =!= "" && col("p") =!= "" && col("obj") =!= "" &&
        (col("obj").startsWith("<") || col("obj").startsWith("\"") ||
          col("obj").startsWith("_:")))
      .select(keep ++ Seq(col("s"), col("p"), col("obj")): _*)
    // '"lex"', '"lex"@lang', '"lex"^^<dt>', '<iri>' or '_:bnode' —
    // escaped quotes inside the lexical form never end it, so the
    // LAST '"' is the closer and everything slices without regex.
    val isIri = col("obj").startsWith("<")
    val isBnode = col("obj").startsWith("_:")
    val suffix = substring_index(col("obj"), "\"", -1)
    val lex = col("obj").substr(lit(2), length(col("obj")) - length(suffix) - lit(2))
    val langTag = when(suffix.startsWith("@"), suffix.substr(lit(2), length(suffix)))
    val dtype = when(suffix.startsWith("^^<"), suffix.substr(lit(4), length(suffix) - lit(4)))
    // o_num derives from the already-decoded o, not a second
    // unesc(lex): the unescape chain (JSON fast path + split fallback)
    // is the parser's heaviest expression, and inlining it twice per
    // projected row blew whole-stage codegen's 64 KB method limit on
    // the fused format→parse plan (which then ran interpreted).
    body
      .withColumn("o",
        when(isIri, col("obj").substr(lit(2), length(col("obj")) - lit(2)))
          .when(isBnode, col("obj"))
          .otherwise(if (decode) unesc(lex) else lex))
      .select(keep ++ Seq(
        col("s"),
        col("p"),
        col("o"),
        when(!isIri && !isBnode && dtype === XSD_DOUBLE, col("o").cast("double"))
          .otherwise(lit(null).cast("double")).as("o_num"),
        (isIri || isBnode).as("o_is_iri"),
        when(!isIri && !isBnode && langTag.isNotNull, langTag)
          .otherwise(lit(null).cast("string")).as("lang")): _*)
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
