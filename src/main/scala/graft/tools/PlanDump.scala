package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of registered driver keys.
  *
  * {{{ sbt "runMain graft.tools.PlanDump key1,key2 [sfDir]" }}}
  *
  * The same plans PlanSpec asserts on — use this to READ a plan before
  * pinning its shape in a test, and to spot-check pushdown/broadcast/
  * codegen on a key you just tuned.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"===== $k =====")
      println(graft.SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
