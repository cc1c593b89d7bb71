package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-COUNT invariance soak (VERDICT r16 task #2): the r16 GRAPH ?g
  * threading's whole claim is that the plan — and therefore the
  * runtime — does not scale with the number of named graphs (the
  * pre-r16 fallback compiled a plan PER graph). PlanSpec pins the
  * plan shape at 2-vs-6 graphs; this main proves the claim at graph
  * SCALE: the SAME total quad volume partitioned into 10 / 100 /
  * 1000 named graphs, timing the two threaded driver-key shapes
  * (property-path closure, general group body) at each count. Flat
  * medians across the sweep = invariance; the enumerate fallback's
  * plan-per-graph shape would explode at 1000.
  *
  * Usage: runMain graft.tools.GraphScaleSoak [chains] [reps]
  * Output: one JSON line (append to SOAK_GRAPHS_r17.log).
  */
object GraphScaleSoak {

  /** `chains` disjoint 3-hop chains plus one :name triple per chain,
    * chain i assigned to graph i % nGraphs — total volume is constant
    * in nGraphs, and every chain is confined to ONE graph, so the
    * per-graph closure answer is the same at every partitioning.
    */
  private def quads(spark: SparkSession, chains: Long,
                    nGraphs: Int): DataFrame = {
    val base = spark.range(chains)
      .select(col("id"), concat(lit("g:"), col("id") % nGraphs).as("g"))
    val edges = base.select(col("g"),
        explode(array((0 until 3).map(k => struct(
          concat(lit("n:"), col("id"), lit(":"), lit(k)).as("s"),
          concat(lit("n:"), col("id"), lit(":"), lit(k + 1)).as("o"))): _*))
          .as("e"))
      .select(col("g"), col("e.s").as("s"), lit(":e").as("p"),
        col("e.o").as("o"))
    val names = base.select(col("g"),
      concat(lit("n:"), col("id"), lit(":0")).as("s"),
      lit(":name").as("p"), concat(lit("name"), col("id")).as("o"))
    edges.unionByName(names)
      .select(col("g"), col("s"), col("p"), col("o"),
        lit(null).cast("double").as("o_num"),
        (col("p") === ":e").as("o_is_iri"),
        lit(null).cast("string").as("lang"))
  }

  def main(args: Array[String]): Unit = {
    val chains = if (args.nonEmpty) args(0).toLong else 20000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val pathQ = "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x :e+ ?y } }"
    val groupQ =
      """SELECT ?g ?x ?n ?y WHERE { GRAPH ?g {
        |  ?x :name ?n OPTIONAL { ?x :e ?y } } }""".stripMargin
    // r17.j machinery: the grouped top-k-per-graph cut (one grouped
    // fold + one group-limit window, no plan per graph)
    val topkQ =
      """SELECT ?g ?x ?c WHERE { GRAPH ?g {
        |  { SELECT ?x (COUNT(?y) AS ?c) WHERE { ?x :e ?y }
        |    GROUP BY ?x ORDER BY DESC(?c) ?x LIMIT 3 } } }""".stripMargin
    val counts = Seq(10, 100, 1000)
    val results = for (n <- counts; (qname, q) <- Seq("path" -> pathQ,
        "group" -> groupQ, "topk" -> topkQ)) yield {
      // materialize the fixture OUTSIDE the timing (parquet scratch,
      // like the bench layout warmup) so the timer sees query cost,
      // not fixture synthesis
      val dir = s"target/graphsoak/q$n"
      quads(spark, chains, n).write.mode("overwrite").parquet(dir)
      val qd = spark.read.parquet(dir)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.sparql.Compiler.runQuads(qd,
            graft.sparql.SparqlParser.parse(q))
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.releaseCaches(blocking = true)
        dt
      }.sorted
      val med = times(times.length / 2)
      println(f"[graphsoak] graphs=$n $qname median=$med%.2f " +
        s"runs=${times.map(t => f"$t%.2f").mkString(",")}")
      (n, qname, med)
    }
    // plan-shape counters at the sweep's ends: the threaded plan must
    // not grow a union branch or a scan per named graph. Count CONCRETE
    // operator nodes (r17 ADVICE) — a substring match on the plan
    // string can hit unrelated tokens ("ReusedScan", column names) and
    // drifts across Spark versions; a tree walk cannot. "Scans" =
    // leaf exec nodes (file/local/in-memory scans), descending into
    // AQE wrappers so the counted tree is the one that would execute.
    def shape(n: Int, q: String): (Int, Int) = {
      import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, UnionExec}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val qd = spark.read.parquet(s"target/graphsoak/q$n")
      val p = graft.sparql.Compiler.runQuads(qd,
        graft.sparql.SparqlParser.parse(q))
        .queryExecution.executedPlan
      var unions = 0
      var scans = 0
      def walk(node: SparkPlan): Unit = {
        node match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _: UnionExec => unions += 1
          case _: LeafExecNode => scans += 1
          case _ => ()
        }
        node.children.foreach(walk)
      }
      walk(p)
      (unions, scans)
    }
    val shapes = Seq("path" -> pathQ, "group" -> groupQ,
        "topk" -> topkQ).map {
      case (nm, q) => nm -> (shape(10, q), shape(1000, q))
    }
    val medJson = results.map { case (n, qn, m) =>
      s""""${qn}_g$n":$m""" }.mkString(",")
    val shapeJson = shapes.map { case (nm, (a, b)) =>
      s""""${nm}_shape_g10":[${a._1},${a._2}],"${nm}_shape_g1000":[${b._1},${b._2}]"""
    }.mkString(",")
    println(s"""{"metric":"graph_count_soak","chains":$chains,""" +
      s""""reps":$reps,"medians":{$medJson},"shapes":{$shapeJson}}""")
    spark.stop()
  }
}
