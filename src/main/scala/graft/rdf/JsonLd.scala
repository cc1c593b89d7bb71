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

  private val XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"

  /** Triple relation → one flat JSON-LD node object per subject, one
    * line each (exactly `parse`'s input subset, so round-trips are
    * exact). IRIs emit as {"@id":…}, tagged literals as
    * {"@value":…,"@language":…}, numerics as
    * {"@value":lex,"@type":xsd:double} (keeping the lexical form —
    * a raw JSON number would canonicalize "100.00" to 100.0), plain
    * literals as {"@value":…}. Assumes store-canonical predicate
    * names (no quotes/backslashes) and single-valued (s, p) pairs —
    * both hold for every graph view this library builds.
    */
  def format(triples: DataFrame): DataFrame = {
    val valueJson = when(col("o_is_iri"), to_json(map(lit("@id"), col("o"))))
      .when(col("lang").isNotNull,
        to_json(map(lit("@value"), col("o"), lit("@language"), col("lang"))))
      .when(col("o_num").isNotNull,
        to_json(map(lit("@value"), col("o"), lit("@type"), lit(XSD_DOUBLE))))
      .otherwise(to_json(map(lit("@value"), col("o"))))
    val pair = concat(lit("\""), col("p"), lit("\":"), valueJson)
    val idJson = to_json(map(lit("@id"), col("s")))
    triples
      .groupBy(col("s"))
      .agg(array_sort(collect_list(pair)).as("pairs"),
        first(idJson).as("idj"))
      .select(concat(
        col("idj").substr(lit(1), length(col("idj")) - lit(1)), lit(","),
        array_join(col("pairs"), ","), lit("}")).as("line"))
  }

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
            val num =
              if (st.fieldNames.contains("@type"))
                when(c.getField("@type") === XSD_DOUBLE,
                  c.getField("@value").cast(DoubleType)).otherwise(nullNum)
              else nullNum
            struct(id.as("s"), p.as("p"),
              c.getField("@value").cast(StringType).as("o"),
              num.as("o_num"), lit(false).as("o_is_iri"), lang.as("lang"))
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
