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
}
