package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale soak for the theta-compat fallback (the 7+-risky-var escape
  * hatch past the 2^6 mask budget, Compiler.thetaCompat*): builds a
  * 7-shared-risky-var query over the REAL dimension store — two
  * order-star OPTIONALs sharing ?v1..?v7 (two of them aliases of one
  * predicate, which is legal and counts) — and runs the LeftJoin,
  * Join, and MINUS variants timed. The conformance suite pins the
  * fallback's ANSWERS on fixtures; this main proves the nested-loop
  * shape completes on soak-scale data (the right side is FILTER-cut
  * inside the optional, the honest shape for a deliberate-rarity
  * path).
  *
  * Usage: sbt "runMain graft.tools.ThetaSoak <dataDir> [priceFloor]"
  */
object ThetaSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val floor = if (args.length > 1) args(1).toDouble else 500000.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def star(v: String) =
      s"?$v :byCustomer ?v1 . ?$v :totalprice ?v2 . ?$v :orderdate ?v3 . " +
        s"?$v :orderstatus ?v4 . ?$v :orderpriority ?v5 . ?$v a ?v6 . " +
        s"?$v :totalprice ?v7 . FILTER(?v2 > $floor)"
    val queries = Seq(
      "theta_leftjoin" ->
        s"""SELECT ?n ?y WHERE { ?x a :Nation . ?x :name ?n
           |  OPTIONAL { ${star("x")} }
           |  OPTIONAL { ${star("y")} } }""".stripMargin,
      "theta_join" ->
        s"""SELECT ?n ?y WHERE {
           |  { ?x a :Nation . ?x :name ?n OPTIONAL { ${star("x")} } }
           |  ${star("y")} }""".stripMargin,
      "theta_minus" ->
        s"""SELECT ?n WHERE { ?x a :Nation . ?x :name ?n
           |  OPTIONAL { ${star("x")} }
           |  MINUS { ${star("y")} } }""".stripMargin)

    val t = graft.rdf.TripleStore.dimensionTriples(spark, dir)
    val results = queries.map { case (name, q) =>
      val t0 = System.nanoTime()
      val rows = graft.Graft.sparql(t, q).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[theta-soak] $name rows=$rows sec=$sec%.1f")
      s""""$name":{"rows":$rows,"sec":$sec}"""
    }
    println(s"""{"metric":"theta_soak","sf":"$dir","queries":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
