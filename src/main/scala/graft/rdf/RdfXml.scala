package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** RDF/XML import/export — the reference accepts RDF/XML as a
  * first-class import format (reference:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:45) and
  * serves it from its endpoint (RDFEndpoint.java:54).
  *
  * XML is not line-splittable, so unlike N-Triples the unit of
  * parallelism is the FILE: `read` parses each whole file in one
  * executor task (scales over many-file corpora — the shape real
  * ontology collections ship in); a single giant document parses on
  * one core, which is the honest bound for this format — bulk
  * instance data belongs in N-Triples.
  *
  * Subset: rdf:Description / typed node elements carrying rdf:about
  * or rdf:nodeID, property elements with rdf:resource / rdf:nodeID /
  * rdf:datatype / xml:lang / text content. Blank nodes keep their
  * `_:` prefix, same convention as [[NTriples.parse]]. Nested node
  * elements are out of subset (pre-flatten, or use N-Triples).
  */
object RdfXml {

  private val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

  /** QName → the store's canonical term string: the RDF namespace
    * stays in compact `rdf:` form (the store's predicate convention,
    * e.g. rdf:type); any other namespace concatenates with the local
    * name, so xmlns:g=":" + name = ":name".
    */
  private def term(ns: String, local: String): String =
    if (ns == RDF_NS) "rdf:" + local
    else (if (ns == null) "" else ns) + local

  /** Pure single-document StAX pull parse; serializable-safe to run
    * inside executor tasks. DTDs and external entities are disabled
    * (no XXE).
    */
  def parseDocument(xml: String): Seq[(String, String, String, Option[Double], Boolean, Option[String])] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val out = Seq.newBuilder[(String, String, String, Option[Double], Boolean, Option[String])]
    var depth = 0
    var subject = ""
    var pred = ""
    var lang: Option[String] = None
    var dtype: Option[String] = None
    var emitted = false
    var nested = false // saw out-of-subset nested node elements
    val text = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case C.START_ELEMENT =>
            depth += 1
            if (depth > 3) nested = true
            if (depth == 2) {
              subject = Option(r.getAttributeValue(RDF_NS, "about"))
                .orElse(Option(r.getAttributeValue(RDF_NS, "nodeID")).map("_:" + _))
                .getOrElse("")
              // typed node element shorthand: <g:Nation rdf:about=..>
              if (r.getNamespaceURI != RDF_NS || r.getLocalName != "Description")
                out += ((subject, "rdf:type",
                  term(r.getNamespaceURI, r.getLocalName), None, true, None))
            } else if (depth == 3) {
              pred = term(r.getNamespaceURI, r.getLocalName)
              lang = Option(r.getAttributeValue(
                "http://www.w3.org/XML/1998/namespace", "lang"))
              dtype = Option(r.getAttributeValue(RDF_NS, "datatype"))
              text.clear()
              emitted = false
              nested = false
              Option(r.getAttributeValue(RDF_NS, "resource"))
                .orElse(Option(r.getAttributeValue(RDF_NS, "nodeID")).map("_:" + _))
                .foreach { o =>
                  out += ((subject, pred, o, None, true, None))
                  emitted = true
                }
            }
          case C.CHARACTERS | C.CDATA =>
            if (depth == 3) text.append(r.getText)
          case C.END_ELEMENT =>
            // a property that contained nested node elements is out of
            // subset: drop it (same policy as N-Triples' malformed
            // objects) rather than emit a partial literal
            if (depth == 3 && !emitted && !nested) {
              val o = text.toString
              val num =
                if (dtype.contains(XSD_DOUBLE)) o.toDoubleOption else None
              out += ((subject, pred, o, num, false, lang))
            }
            depth -= 1
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  private def toDf(spark: SparkSession,
                   docs: org.apache.spark.sql.Dataset[String]): DataFrame = {
    import spark.implicits._
    docs.flatMap(parseDocument _)
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
  }

  /** One in-memory document → the triple relation. */
  def parse(spark: SparkSession, xml: String): DataFrame = {
    import spark.implicits._
    toDf(spark, spark.createDataset(Seq(xml)))
  }

  /** Parse a directory of RDF/XML files — one whole file per task.
    * Lenient on corrupt files (a malformed document yields no triples
    * instead of failing the whole job — the reference's importers log
    * and continue too, RDFImport.java:175-180); use `parse` for the
    * strict single-document path.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(xml =>
        scala.util.Try(parseDocument(xml)).getOrElse(Seq.empty))
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
  }

  /** XML-escape markup chars plus whitespace the parser would
    * otherwise normalize away: bare CR becomes LF in text content,
    * and tabs/newlines collapse to spaces inside attribute values —
    * numeric character references survive both.
    */
  private def xmlEsc(v: String): String =
    v.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
      .replace("\r", "&#13;").replace("\n", "&#10;").replace("\t", "&#9;")

  /** Serialize a BOUNDED triple slice as one RDF/XML document string
    * (driver-side assembly — endpoint responses and ontology exports;
    * bulk export belongs to [[NTriples.write]]). Predicate namespaces
    * are minted as ns0..nsK root declarations, so `parse` round-trips
    * the store-canonical term strings exactly.
    */
  def formatString(triples: DataFrame): String = {
    val rows = FormatGuard.collectBounded(
      triples.select("s", "p", "o", "o_num", "o_is_iri", "lang"),
      "RdfXml.formatString")
    def split(p: String): (String, String) = {
      val i = p.lastIndexWhere(c => c == ':' || c == '/' || c == '#')
      (p.substring(0, i + 1), p.substring(i + 1))
    }
    val nsList = rows.map(r => split(r.getString(1))._1).distinct.sorted
    val nsPrefix = nsList.zipWithIndex
      .map { case (ns, i) => ns -> s"ns$i" }.toMap
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= s"""<rdf:RDF xmlns:rdf="$RDF_NS""""
    nsPrefix.toSeq.sortBy(_._2).foreach { case (ns, pfx) =>
      sb ++= s""" xmlns:$pfx="${xmlEsc(ns)}""""
    }
    sb ++= ">\n"
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (s, rs) =>
      val subjAttr =
        if (s.startsWith("_:")) s"""rdf:nodeID="${xmlEsc(s.drop(2))}""""
        else s"""rdf:about="${xmlEsc(s)}""""
      sb ++= s"  <rdf:Description $subjAttr>\n"
      rs.foreach { r =>
        val (ns, local) = split(r.getString(1))
        val el =
          if (ns == "rdf:") s"rdf:$local" else s"${nsPrefix(ns)}:$local"
        val o = r.getString(2)
        if (r.getBoolean(4)) {
          val objAttr =
            if (o.startsWith("_:")) s"""rdf:nodeID="${xmlEsc(o.drop(2))}""""
            else s"""rdf:resource="${xmlEsc(o)}""""
          sb ++= s"    <$el $objAttr/>\n"
        } else {
          val langAttr =
            if (!r.isNullAt(5)) s""" xml:lang="${r.getString(5)}"""" else ""
          val dtAttr =
            if (!r.isNullAt(3)) s""" rdf:datatype="$XSD_DOUBLE"""" else ""
          sb ++= s"    <$el$langAttr$dtAttr>${xmlEsc(o)}</$el>\n"
        }
      }
      sb ++= "  </rdf:Description>\n"
    }
    sb ++= "</rdf:RDF>\n"
    sb.toString
  }
}
