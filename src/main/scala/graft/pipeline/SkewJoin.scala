package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys — the standing fix when one
  * hot key (a bot user, a null-ish default, one viral document) would
  * otherwise pin an entire join to a single reducer and the other
  * side is too big to broadcast.
  *
  * The fact side derives a deterministic salt in [0, salts) by
  * hashing a high-cardinality companion column (NOT the join key —
  * the hot key's rows must land on different salts); the other side
  * replicates ×salts; the join key becomes (key, salt), so the hot
  * key's rows spread over `salts` reducers. AQE's skew-join split
  * covers the sort-merge case at runtime; the salt is the plan-level
  * guarantee that also works for hash joins and pre-AQE engines.
  */
object SkewJoin {

  /** `fact ⋈ dim` on `key`, fact salted by `saltSource`. The dim side
    * is replicated `salts`× via a sequence explode (rows, not a
    * shuffle), so dim must be the smaller relation — exactly the
    * situation where it is still too big for a broadcast.
    */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
             saltSource: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn would silently OVERWRITE a pre-existing __salt column
    // (corrupting the join and leaking the caller's column); refuse
    // loudly instead — the name is this operator's private plumbing
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
