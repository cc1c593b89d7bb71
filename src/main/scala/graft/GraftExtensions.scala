package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Config-level injection of graft's native SQL functions — the
  * deployment path that needs NO code changes on the user side:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every session on the cluster (spark-sql shells, JDBC
  * thriftserver, notebooks) can call `cosine_sim` / `dot_int` /
  * `bloom_contains` in textual SQL, reaching the same fused codegen
  * kernels the DataFrame API uses. [[Graft.registerFunctions]] is the
  * session-level twin for programmatic setups; both paths share the
  * per-function descriptors so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.functions.CosineSimilarity.descriptor)
    ext.injectFunction(graft.functions.DotProductInt.descriptor)
    ext.injectFunction(graft.functions.BloomContains.descriptor)
  }
}
