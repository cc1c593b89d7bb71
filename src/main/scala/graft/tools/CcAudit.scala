package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CC-at-scale audit (VERDICT r16 task #4): `graph_connected_
  * components` ran 46.8 s at sf1 — linear but a big constant. This
  * main measures the two candidate engines on the key's EXACT input
  * (the customer→nation→region geo edges, suppliers excluded) at a
  * given SF: GraphX Pregel ([[graft.graphx.Analytics
  * .connectedComponents]]) vs the checkpointed DataFrame hash-min
  * loop ([[graft.graphx.Analytics.connectedComponentsDF]]). Warm
  * store, N reps each, blocking cache release between reps — the
  * keep-or-swap decision reads these medians.
  *
  * Usage: runMain graft.tools.CcAudit [sfDir] [reps]
  */
object CcAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the driver key's input, reconstructed (GraphQueries.geoEdges
    // with withSuppliers = false); store build warms OUTSIDE timing,
    // matching the bench sweep's store-warm regime for this key
    val t = graft.rdf.TripleStore.dimensionTriples(spark, dir)
    val edges = graft.rdf.PropertyGraph.edges(t)
      .filter(col("rel").isin(":hasNation", ":inRegion"))
      .filter(!col("src").startsWith("supp:"))
      .select(col("src"), col("dst"))
    println(s"[ccaudit] edges=${edges.count()}")

    def rep(run: () => Unit): Double = {
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.graphx.Analytics.releaseCaches()
      graft.Checkpoints.releaseCaches(blocking = true)
      dt
    }
    val runGx = () =>
      graft.graphx.Analytics.connectedComponents(spark, edges)
        .write.format("noop").mode("overwrite").save()
    val runDf = () =>
      graft.graphx.Analytics.connectedComponentsDF(spark, edges)
        .write.format("noop").mode("overwrite").save()
    // order-neutral comparison (r17 ADVICE): one discarded warm-up rep
    // per engine, then ALTERNATE which engine goes first within each
    // timed round, so JIT/codegen/page-cache warm-up can't
    // systematically favor whichever engine runs second
    rep(runGx); rep(runDf)
    val rounds = (1 to reps).map { i =>
      if (i % 2 == 1) { val g = rep(runGx); val d = rep(runDf); (g, d) }
      else { val d = rep(runDf); val g = rep(runGx); (g, d) }
    }
    def med(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.length / 2) }
    val gx = med(rounds.map(_._1))
    val df = med(rounds.map(_._2))
    println(f"[ccaudit] graphx median=$gx%.2f " +
      s"runs=${rounds.map(r => f"${r._1}%.2f").mkString(",")}")
    println(f"[ccaudit] dfloop median=$df%.2f " +
      s"runs=${rounds.map(r => f"${r._2}%.2f").mkString(",")}")
    println(s"""{"metric":"cc_audit","sf_dir":"$dir","reps":$reps,""" +
      s""""graphx_median":$gx,"dfloop_median":$df,""" +
      s""""df_rounds":${graft.graphx.Analytics.lastCcRounds}}""")
    spark.stop()
  }
}
