package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turtle-subset writer and parser.
  *
  * Subset: `@prefix` declarations, prefixed names, one statement per
  * line with `;` predicate-object chains, string literals (with @lang
  * or ^^xsd:double), full IRIs in angle brackets. One statement per
  * line keeps files line-splittable, so parsing stays a parallel scan
  * (the reference funnels Turtle through a single RDF4J parser:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:50-155).
  *
  * The prefix table is ontology-sized metadata: collecting it to the
  * driver and broadcasting is the right call at any scale.
  */
object Turtle {

  private val XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

  /** Triple relation → DataFrame("line"): @prefix header then one
    * `subject pred obj ; pred obj .` statement line per subject.
    */
  def format(triples: DataFrame): DataFrame = {
    val uris = triples.select(col("s").as("u"))
      .unionAll(triples.select(col("p").as("u")))
      .unionAll(triples.filter(col("o_is_iri")).select(col("o").as("u")))
    val reg = Namespaces.registry(uris, col("u"))
    val header = reg.select(
      concat(lit("@prefix "), col("prefix"), lit(": <"), col("ns"),
        lit("> .")).as("line"))

    def short(dfCol: String)(df: DataFrame): DataFrame =
      Namespaces.shorten(df, reg, dfCol)

    val withTerms = short("o_term")(short("p_term")(short("s_term")(
      triples
        .withColumn("s_term", col("s"))
        .withColumn("p_term", col("p"))
        .withColumn("o_term", when(col("o_is_iri"), col("o"))))))
    val lex = NTriples.esc(col("o"))
    val objRendered = when(col("o_is_iri"), col("o_term"))
      // "" is the explicit plain-literal marker, never a tag
      .when(col("lang").isNotNull && col("lang") =!= "",
        concat(lit("\""), lex, lit("\"@"), col("lang")))
      .when(col("o_num").isNotNull,
        concat(lit("\""), lex, lit("\"^^<" + XSD_DOUBLE + ">")))
      .otherwise(concat(lit("\""), lex, lit("\"")))
    val statements = withTerms
      .select(col("s_term"),
        concat(col("p_term"), lit(" "), objRendered).as("po"))
      .groupBy(col("s_term"))
      .agg(array_sort(collect_list(col("po"))).as("pos"))
      .select(concat(col("s_term"), lit(" "),
        array_join(col("pos"), " ; "), lit(" .")).as("line"))
    header.unionAll(statements)
  }

  /** Char-wise inverse of the writer's escaping (\\, \", \n, \r, \t) —
    * sequential scan, so an escaped backslash followed by 'n' is not
    * misread as a newline.
    */
  private def unescapeLit(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case x => sb += x
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private[rdf] final case class ParsedTriple(
      s: String, p: String, o: String, o_num: Option[Double],
      o_is_iri: Boolean, lang: Option[String])

  /** Tokenize one statement line: angle-IRIs, quoted literals with
    * optional @lang / ^^<dt> suffix, prefixed names, `;`, `.`.
    */
  private[rdf] def tokenize(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '<') {
        val end = line.indexOf('>', i)
        require(end >= 0, s"unclosed IRI in: $line")
        out += line.substring(i, end + 1); i = end + 1
      } else if (c == '"') {
        // escape-aware scan (a literal may end in an escaped backslash)
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          line.charAt(j) match {
            case '\\' => j += 2
            case '"' => closed = true
            case _ => j += 1
          }
        }
        require(closed && j < n, s"unclosed literal in: $line")
        var end = j + 1
        // attach @lang or ^^<dt> suffix to the literal token; the lang
        // tag is [A-Za-z0-9-]+ so a directly-attached '.' or ';'
        // terminator is NOT swallowed
        if (end < n && line.charAt(end) == '@') {
          end += 1
          while (end < n && (line.charAt(end).isLetterOrDigit ||
            line.charAt(end) == '-')) end += 1
        } else if (end + 1 < n && line.charAt(end) == '^' && line.charAt(end + 1) == '^') {
          val dtEnd = line.indexOf('>', end)
          require(dtEnd >= 0, s"unclosed datatype in: $line")
          end = dtEnd + 1
        }
        out += line.substring(i, end); i = end
      } else if (c == ';' || c == '.' || c == ',') {
        out += c.toString; i += 1
      } else {
        var j = i
        while (j < n && !line.charAt(j).isWhitespace &&
          line.charAt(j) != ';' && line.charAt(j) != ',') j += 1
        // a trailing '.' after a pname is the statement terminator
        var tok = line.substring(i, j)
        if (tok.length > 1 && tok.endsWith(".")) {
          out += tok.dropRight(1); tok = "."
        }
        out += tok; i = j
      }
    }
    out.result()
  }

  private[rdf] def parseStatement(
      line: String, prefixes: Map[String, String]): Seq[ParsedTriple] = {
    def resolveIri(t: String): String =
      if (t.startsWith("<")) t.substring(1, t.length - 1)
      else if (t.startsWith("_:")) t // blank node label, never resolved
      else {
        val i = t.indexOf(':')
        require(i >= 0, s"not an IRI: $t")
        val pfx = t.substring(0, i + 1)
        prefixes.get(pfx).map(_ + t.substring(i + 1)).getOrElse(t)
      }
    val toks = tokenize(line)
    require(toks.nonEmpty && toks.last == ".", s"statement must end with '.': $line")
    val subject = resolveIri(toks.head)
    val body = toks.tail.dropRight(1)
    // body = p o (',' o)* (';' p o (',' o)*)*
    val groups = Vector.newBuilder[(String, String)]
    var rest = body
    while (rest.nonEmpty) {
      require(rest.length >= 2, s"dangling predicate in: $line")
      val pTok = rest.head
      groups += ((pTok, rest(1)))
      rest = rest.drop(2)
      while (rest.headOption.contains(",")) {
        require(rest.length >= 2, s"dangling ',' in: $line")
        groups += ((pTok, rest(1)))
        rest = rest.drop(2)
      }
      if (rest.nonEmpty) {
        require(rest.head == ";", s"expected ';' in: $line")
        rest = rest.tail
      }
    }
    groups.result().map { case (pTok, oTok) =>
      // 'a' is rdf:type ONLY in predicate position (Turtle grammar);
      // as a subject or object it is a malformed term and rejected
      val p = if (pTok == "a") "rdf:type" else resolveIri(pTok)
      if (oTok.startsWith("\"")) {
        val lexEnd = {
          var j = 1
          while (oTok.charAt(j) != '"') {
            if (oTok.charAt(j) == '\\') j += 2 else j += 1
          }
          j
        }
        val lex = unescapeLit(oTok.substring(1, lexEnd))
        val suffix = oTok.substring(lexEnd + 1)
        val lang = if (suffix.startsWith("@")) Some(suffix.tail) else None
        // exact datatype match; a malformed numeric lexical degrades
        // to a plain literal instead of aborting the whole job
        val num =
          if (suffix == s"^^<$XSD_DOUBLE>")
            scala.util.Try(lex.toDouble).toOption
          else None
        ParsedTriple(subject, p, lex, num, o_is_iri = false, lang)
      } else ParsedTriple(subject, p, resolveIri(oTok), None,
        o_is_iri = true, None)
    }
  }

  /** DataFrame("line") → triple relation. Pass 1 collects the (tiny)
    * prefix table; pass 2 parses statement lines in parallel.
    */
  def parse(spark: SparkSession, lines: DataFrame): DataFrame = {
    import spark.implicits._
    val trimmed = lines.select(trim(col("line")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
    // both declaration forms: Turtle's `@prefix p: <ns> .` and the
    // Turtle 1.1 / SPARQL-style `PREFIX p: <ns>` (no dot, any case).
    // "prefix " can't collide with a subject pname — a pname has ':'
    // where the keyword has whitespace.
    val isPrefixLine = col("line").startsWith("@prefix") ||
      lower(col("line")).startsWith("prefix ")
    val prefixes: Map[String, String] = FormatGuard.collectBounded(
      trimmed.filter(isPrefixLine), "Turtle.parse prefix table")
      .map(_.getString(0))
      .map { l =>
        val m = "(?i)@?prefix\\s+([^\\s]+)\\s+<([^>]*)>\\s*\\.?\\s*$".r
          .findFirstMatchIn(l)
          .getOrElse(throw new IllegalArgumentException(s"bad @prefix: $l"))
        m.group(1) -> m.group(2)
      }.toMap
    val stmts = trimmed.filter(!isPrefixLine).as[String]
    stmts.flatMap(parseStatement(_, prefixes)).toDF()
      .select(col("s"), col("p"), col("o"), col("o_num"),
        col("o_is_iri"), col("lang"))
  }
}
