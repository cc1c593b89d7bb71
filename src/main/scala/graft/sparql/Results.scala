package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SELECT-result serialization — the last leg of a query endpoint
  * (the reference's RDFEndpoint streams query rows back in textual
  * formats; cf. RDFEndpoint.java:50-120). CSV here follows the W3C
  * SPARQL 1.1 Query Results CSV format (= RFC 4180 quoting): fields
  * containing a comma, quote, CR or LF are double-quoted with inner
  * quotes doubled; NULL (unbound) serializes as the empty field.
  *
  * One narrow projection per row — serialization stays inside
  * whole-stage codegen with no shuffle, so a 100 TB result set
  * streams straight from the query plan to the sink.
  */
object Results {

  private def field(c: Column): Column = {
    val s = c.cast("string")
    val quoted = concat(lit("\""),
      regexp_replace(s, "\"", "\"\""), lit("\""))
    coalesce(when(s.rlike("[\",\n\r]"), quoted).otherwise(s), lit(""))
  }

  /** One CSV line per result row (no header row — it is constant for
    * a given projection; endpoints prepend it once, not per
    * partition).
    */
  def toCsv(df: DataFrame): DataFrame =
    df.select(concat_ws(",", df.columns.map(c => field(col(c))): _*)
      .as("line"))

  /** One TSV line per result row — the W3C SPARQL 1.1 Query Results
    * TSV format: no quoting at all; tab, newline, CR and backslash
    * ESCAPE as \t \n \r \\ (TSV is the format built for streaming
    * splitters — a reader splits on raw tabs/newlines with no quote
    * state machine, which is why bulk exporters prefer it). Unbound
    * serializes as the empty field. Same scale shape as [[toCsv]]:
    * one narrow codegen projection, no shuffle.
    */
  def toTsv(df: DataFrame): DataFrame = {
    def esc(c: Column): Column = {
      val s = c.cast("string")
      coalesce(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          s, "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"),
          "\r", "\\\\r"),
        lit(""))
    }
    df.select(concat_ws("\t", df.columns.map(c => esc(col(c))): _*)
      .as("line"))
  }

  /** One `<result>` element per row — the W3C SPARQL Query Results
    * XML Format (the ONE serialization the spec makes mandatory for
    * endpoints; reference: RDFEndpoint's content negotiation).
    * Bindings in projection order, unbound bindings OMITTED (per
    * spec, unlike CSV's empty field); `& < >` escape as entities,
    * `&` first. The `<sparql><head>…` document wrapper is constant
    * for a projection — endpoints prepend it once, as with the CSV
    * header. Same scale shape: one narrow codegen projection.
    */
  def toXmlResults(df: DataFrame): DataFrame = {
    def esc(c: Column): Column = regexp_replace(regexp_replace(
      regexp_replace(c.cast("string"), "&", "&amp;"), "<", "&lt;"),
      ">", "&gt;")
    val bindings = df.columns.map { c =>
      when(col(c).isNull, lit(""))
        .otherwise(concat(lit(s"""<binding name="$c"><literal>"""),
          esc(col(c)), lit("</literal></binding>")))
    }
    df.select(concat(lit("<result>"), concat_ws("", bindings: _*),
      lit("</result>")).as("line"))
  }

  /** One JSON object per result row (JSON-lines — the streamable
    * form of the endpoint's JSON response), keys in projection
    * order. Every bound value serializes as a JSON STRING (the W3C
    * SPARQL JSON results format also carries values stringified with
    * type annotations) — engine-neutral by construction, where raw
    * numeric JSON would inherit each engine's float formatting.
    * Unbound (NULL) serializes as JSON null. Same scale shape as
    * [[toCsv]]: one narrow codegen projection, no shuffle.
    */
  def toJsonLines(df: DataFrame): DataFrame = {
    val fields = df.columns.map { c =>
      val s = col(c).cast("string")
      val esc = regexp_replace(
        regexp_replace(s, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
      concat(lit("\"" + c + "\":"),
        when(s.isNull, lit("null"))
          .otherwise(concat(lit("\""), esc, lit("\""))))
    }
    df.select(
      concat(lit("{"), concat_ws(",", fields: _*), lit("}")).as("line"))
  }
}
