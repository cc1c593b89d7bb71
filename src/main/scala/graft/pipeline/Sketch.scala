package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed sketches for corpus statistics. The cardinality sketch
  * here is a PORTABLE HyperLogLog: registers derive from md5 hex via
  * integer/string ops only (no engine-private hash, no libm in the
  * register path), so any SQL engine reproduces the registers — and
  * therefore the estimate — bit for bit. That portability is also the
  * test story: the DuckDB oracle replays the identical construction.
  *
  * Scale shape: the input explodes to grams but immediately folds into
  * at most 2^p register rows via a map-side-combined MAX — no distinct,
  * no gram shuffle (duplicates cannot move a register maximum, so the
  * usual dedup pass is unnecessary BY CONSTRUCTION). At 100 TB the
  * shuffle carries ≤ 256 rows per map partition; the alternative exact
  * count shuffles every distinct gram.
  */
object Sketch {

  /** HyperLogLog estimate of the number of distinct lowercased word
    * n-grams in the corpus, m = 256 registers (p = 8).
    *
    * Register index = md5 hex chars 1-2 (8 bits); rho = leading-zero
    * bits of the 48-bit slice in hex chars 3-14, plus one — computed
    * with string ops (count leading '0' hex digits, then a 15-way CASE
    * on the first nonzero digit), never floating log. The register
    * sum Σ 2^-max(rho) runs in FIXED-POINT (2^(52-rho) as BIGINT), so
    * the harmonic mean is one exact integer sum — float summation
    * order can't perturb it on any engine. The final α·m²/Σ is a
    * fixed-shape double expression over that integer.
    *
    * Raw-range estimator (valid for true cardinality ≳ 2.5·m); the
    * small-range linear-counting correction needs ln(), which is not
    * bit-portable across engines, and the corpus gram space sits far
    * above the raw threshold anyway.
    */
  def hllNgramDistinct(docs: DataFrame, n: Int = 5): DataFrame = {
    val grams = docs
      .select(TextAnalysis.wsTokens(lower(col("text"))).as("w"))
      .filter(size(col("w")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("w")) - n),
        i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(n)))
          .cast("binary")))).as("hx"))
    val slice48 = substring(col("hx"), 3, 12)
    val zerosHex = length(regexp_extract(slice48, "^0*", 0))
    val firstNonzero = substring(regexp_replace(slice48, "^0*", ""), 1, 1)
    val headBits = when(firstNonzero === "1", 3)
      .when(firstNonzero.isin("2", "3"), 2)
      .when(firstNonzero.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(slice48 === "000000000000", lit(49))
      .otherwise(zerosHex * 4 + headBits + 1)
    val registers = grams
      .select(conv(substring(col("hx"), 1, 2), 16, 10).cast("long").as("r"),
        rho.as("rho"))
      .groupBy(col("r")).agg(max(col("rho")).as("mx"))
    val folded = registers.agg(
      count(lit(1)).as("n_present"),
      // coalesce keeps the no-grams corpus total (all registers absent
      // → the documented raw-range floor), instead of a null estimate
      coalesce(sum(
        expr("cast(shiftleft(cast(1 as bigint), 52 - mx) as bigint)")),
        lit(0L)).as("fp"))
    // absent registers contribute 2^-0 = 1 → 2^52 in fixed point;
    // the double tree mirrors the oracle SQL token for token
    folded.select(
      col("n_present"),
      (col("fp") + (lit(256) - col("n_present")) * lit(4503599627370496L))
        .as("sum_fp"))
      .select(col("n_present"), col("sum_fp"),
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256))) * lit(65536) *
          lit(4503599627370496.0) / col("sum_fp").cast("double"))
          .as("estimate"))
  }
}
