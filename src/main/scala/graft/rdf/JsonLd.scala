package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-LD subset importer: flat node objects, one JSON document per
  * line — `{"@id": iri, pred: value, …}` where a value is a plain
  * literal, a number, `{"@id": iri}` (edge) or
  * `{"@value": lex, "@language": tag}`.
  *
  * One-line-per-node keeps the input line-splittable; the reference
  * routes JSON-LD through a single RDF4J parser thread (reference:
  * pidb-rdf-import/src/main/java/semantics/RDFImport.java:50-155 —
  * format list includes JSON-LD). Schema inference is one sampling
  * pass over the input; the melt to triples is then pure column
  * expressions per inferred field.
  */
object JsonLd {

  def parse(spark: SparkSession, lines: DataFrame): DataFrame = {
    import spark.implicits._
    val df = spark.read.json(lines.select(col("line")).as[String])
    require(df.columns.contains("@id"), "JSON-LD subset requires @id on every node")
    val id = col("`@id`")

    def nullStr: Column = lit(null).cast(StringType)
    def nullNum: Column = lit(null).cast(DoubleType)

    val tripleCols: Seq[Column] = df.schema.fields.toSeq
      .filter(_.name != "@id")
      .map { f =>
        val c = col(s"`${f.name}`")
        val p = lit(f.name)
        f.dataType match {
          case st: StructType if st.fieldNames.contains("@id") =>
            struct(id.as("s"), p.as("p"), c.getField("@id").as("o"),
              nullNum.as("o_num"), lit(true).as("o_is_iri"), nullStr.as("lang"))
          case st: StructType if st.fieldNames.contains("@value") =>
            val lang =
              if (st.fieldNames.contains("@language")) c.getField("@language")
              else nullStr
            struct(id.as("s"), p.as("p"),
              c.getField("@value").cast(StringType).as("o"),
              nullNum.as("o_num"), lit(false).as("o_is_iri"), lang.as("lang"))
          case _: NumericType =>
            struct(id.as("s"), p.as("p"), c.cast(StringType).as("o"),
              c.cast(DoubleType).as("o_num"), lit(false).as("o_is_iri"),
              nullStr.as("lang"))
          case _ =>
            struct(id.as("s"), p.as("p"), c.cast(StringType).as("o"),
              nullNum.as("o_num"), lit(false).as("o_is_iri"), nullStr.as("lang"))
        }
      }
    df.select(explode(array(tripleCols: _*)).as("t"))
      .select(col("t.*"))
      .filter(col("o").isNotNull)
  }
}
