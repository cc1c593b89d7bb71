package graft.rdf

import org.apache.spark.sql.{DataFrame, Row}

/** Priced bound for driver-side document assembly. The
  * `formatString`-family endpoints (one RDF/XML document, one DESCRIBE
  * response) legitimately collect — a response is one document — but
  * nothing used to ENFORCE the "node-sized" contract: a caller passing
  * an unbounded slice would OOM the driver silently. Every such
  * collect now goes through [[collectBounded]], which caps the pull at
  * the source (`limit(cap+1)` executes distributed, so at most cap+1
  * rows ever reach the driver) and fails loudly past the cap, pointing
  * the caller at the distributed writers ([[NTriples.write]] etc.).
  */
object FormatGuard {

  /** Default one million rows: a formatted document of that size is
    * tens–hundreds of MB — the honest ceiling for "one response".
    * Overridable via the `graft.format.collect.max` system property so
    * tests can exercise the over-cap failure without a huge fixture.
    */
  def maxRows: Int =
    sys.props.get("graft.format.collect.max").map(_.toInt)
      .getOrElse(1000000)

  /** Collect at most [[maxRows]] rows for driver-side assembly; throw
    * a pointed error if the slice exceeds the cap. One job: the limit
    * rides into the scan, so the guard never materializes more than
    * cap+1 rows driver-side even when the check fails.
    */
  def collectBounded(df: DataFrame, what: String): Array[Row] = {
    val cap = maxRows
    val rows = df.limit(cap + 1).collect()
    if (rows.length > cap) throw new IllegalStateException(overCap(what, cap))
    rows
  }

  /** Price a slice BEFORE a formatter runs over it: distributed
    * `limit(cap+1).count()` (never more than cap+1 rows counted), loud
    * failure past the cap. Use this when the formatted unit is not the
    * row — Turtle folds a whole subject star into ONE line, so a
    * line-level cap alone would let a million-object star through.
    */
  def assertBounded(df: DataFrame, what: String): DataFrame = {
    val cap = maxRows
    if (df.limit(cap + 1).count() > cap)
      throw new IllegalStateException(overCap(what, cap))
    df
  }

  private def overCap(what: String, cap: Int): String =
    s"$what: slice exceeds the $cap-row driver-assembly cap — " +
      "endpoint formatters build ONE document driver-side; use the " +
      "distributed writers (NTriples.write / NQuads.write) for bulk " +
      "export, or raise -Dgraft.format.collect.max if the response " +
      "is genuinely this large"
}
