package graft

import org.apache.spark.sql.DataFrame

/** Tracked eager localCheckpoints for query bodies that need a plan
  * barrier (e.g. the fused derive→format→parse round-trip tests,
  * whose single janino method otherwise grows past 64 KB and drops
  * the whole stage to interpreted eval). A bare localCheckpoint()
  * persists a block the session can never drop; this registry lets
  * the harness release them with the same contract as
  * [[graft.pipeline.Dedup.releaseCaches]]: release once the returned
  * DataFrames are consumed, never mid-flight.
  */
object Checkpoints {

  private val released =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]())

  /** Eager localCheckpoint whose backing RDD is registered for
    * [[releaseCaches]].
    */
  def tracked(df: DataFrame): DataFrame = trackedWithHandle(df)._1

  /** [[tracked]], also returning the backing RDD — iterative loops
    * (pagerank, k-core, LPA) unpersist each superseded generation
    * directly so peak storage stays at one generation; the registry
    * still drains whatever remains at release time (double-unpersist
    * is a no-op).
    */
  def trackedWithHandle(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    val out = df.localCheckpoint()
    val rdd = out.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.getOrElse(sys.error(
      "localCheckpoint did not produce a LogicalRDD leaf — " +
        "Spark version drift in checkpoint plan shape"))
    released.add(rdd)
    (out, rdd)
  }

  /** Drain the registry. `blocking = true` waits for the block
    * manager to actually drop each block — the measurement loops use
    * it so an async removal backlog from rep N can't pressure rep
    * N+1's checkpoints into disk spills (the r16 adjudication of the
    * LPA medians spread); operators keep the non-blocking default.
    */
  def releaseCaches(blocking: Boolean = false): Unit = released.synchronized {
    val it = released.iterator()
    while (it.hasNext) { it.next().unpersist(blocking); it.remove() }
  }
}
