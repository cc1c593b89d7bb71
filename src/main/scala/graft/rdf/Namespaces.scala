package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Namespace-prefix registry: distinct namespaces of a URI column,
  * auto-minted as ns0, ns1, … in deterministic (alphabetical) order —
  * the reference mints the same way as URIs arrive
  * (reference: pidb-rdf-import/src/main/java/semantics/DirectStatementLoader.java,
  * namespace map handling); alphabetical ordering makes the registry
  * reproducible under distributed, order-free execution.
  *
  * The registry is ontology-sized (a handful of rows) — always
  * broadcast; the window over a single partition is fine at any data
  * scale because it runs on the *distinct namespaces*, not the data.
  */
object Namespaces {

  /** DataFrame(ns, prefix): e.g. ("cust:", "ns0"), ("line:", "ns1") … */
  def registry(df: DataFrame, uriCol: Column): DataFrame = {
    val ns = df.select(UriFunctions.namespace(uriCol).as("ns"))
      .filter(col("ns") =!= "").distinct()
    // the global rank over the tiny distinct set needs one partition
    // either way; partitioning by a NON-FOLDABLE constant (lit(0)
    // would be stripped by EliminateWindowPartitions) keeps the spec
    // defined so WindowExec doesn't log its single-partition warning
    // on every run
    ns.withColumn("prefix",
      concat(lit("ns"),
        (row_number().over(
          Window.partitionBy(substring(col("ns"), 0, 0)).orderBy(col("ns"))) - 1)
          .cast("string")))
  }

  /** Rewrites `uriCol` of `df` to its shortened `nsK:local` form using
    * a broadcast join against the registry; URIs with an unknown
    * namespace pass through unchanged.
    */
  def shorten(df: DataFrame, registry: DataFrame, uriCol: String): DataFrame = {
    val r = broadcast(registry.withColumnRenamed("ns", "__ns")
      .withColumnRenamed("prefix", "__prefix"))
    df.join(r, UriFunctions.namespace(col(uriCol)) === col("__ns"), "left_outer")
      .withColumn(uriCol,
        when(col("__prefix").isNotNull,
          concat(col("__prefix"), lit(":"), UriFunctions.localName(col(uriCol))))
          .otherwise(col(uriCol)))
      .drop("__ns", "__prefix")
  }
}
