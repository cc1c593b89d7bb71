package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FastHash.md5 // shadows functions.md5 → Md5Fast (r19)

/** Blank-node canonical labeling — the per-NODE companion of
  * [[Reification.graphDigest]]'s whole-graph hash, and the problem the
  * W3C RDF Dataset Canonicalization (RDFC-1.0 / URDNA2015) spec
  * solves: give every blank node a label that depends only on the
  * graph's STRUCTURE, so two isomorphic graphs with different local
  * labels canonicalize identically (diffable, digestible, mergeable).
  * Reference surface: the blank-scoped import machinery
  * (RDFImport.java:50-155) never re-labels — a cross-file diff over
  * blanks is impossible there; this closes that.
  *
  * Algorithm: Weisfeiler-Leman color refinement, the core of
  * RDFC-1.0's first-degree hashing. Round 0 hashes each blank's
  * sorted multiset of grounded edge signatures (blank neighbors as a
  * placeholder); each later round re-hashes with neighbors' previous
  * labels substituted. Two rounds resolve everything except graphs
  * with non-trivial automorphisms, where RDFC-1.0 falls back to
  * per-orbit branching — out of scope here and documented: labels are
  * deterministic and isomorphism-invariant, but automorphic twins
  * share a label instead of being split.
  *
  * Scale shape: each round is two keyed joins (out- and in-neighbor
  * label lookup) plus one groupBy collecting each blank's signature
  * list — per-blank state bounded by its degree, rounds a query
  * constant. The WL shuffle carries (blank, signature) rows: linear
  * in the blank-incident edge count per round.
  */
object Canon {

  private def isBlank(c: Column): Column = c.startsWith("_:")

  /** (b, canon) for every blank node in the triple relation. */
  def canonLabels(triples: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "at least the grounded round")
    val t = triples.select(col("s"), col("p"), col("o"))

    // one WL round: neighbor blanks represented by `lookup` (previous
    // labels) or the "_" placeholder on the grounded round
    def round(labels: Option[DataFrame]): DataFrame = {
      def term(c: Column, nl: Column): Column =
        when(isBlank(c), labels.map(_ => coalesce(nl, lit("_")))
          .getOrElse(lit("_"))).otherwise(c)
      def sigs(side: DataFrame, b: Column, tag: String,
               nbr: Column): DataFrame = {
        val joined = labels match {
          case Some(l) => side.join(
            l.select(col("b").as("__nb"), col("canon").as("__nl")),
            nbr === col("__nb"), "left_outer")
          case None => side.withColumn("__nl", lit(null).cast("string"))
        }
        joined.select(b.as("b"),
          concat(lit(tag), col("p"), lit("|"),
            term(nbr, col("__nl"))).as("sig"))
      }
      val out = sigs(t.filter(isBlank(col("s"))), col("s"), "o|", col("o"))
      val in = sigs(t.filter(isBlank(col("o"))), col("o"), "i|", col("s"))
      out.unionByName(in)
        .groupBy(col("b"))
        .agg(md5(concat_ws("\n", sort_array(collect_list(col("sig"))))
          .cast("binary")).as("canon"))
    }

    (2 to rounds).foldLeft(round(None))((l, _) => round(Some(l)))
  }

  /** Isomorphism-INVARIANT graph digest: [[canonLabels]] substituted
    * for every blank, then [[Reification.graphDigest]]'s commutative
    * XOR fold. The plain digest is layout-independent but LABEL-
    * dependent (re-importing a blank-bearing file with fresh labels
    * changes it); this one answers "is it the same graph?" across
    * imports — the check RDFC-1.0 canonicalization exists to enable.
    * Two keyed label joins + the same narrow one-row fold.
    */
  def canonDigest(triples: DataFrame): DataFrame = {
    val labels = canonLabels(triples)
    def sub(c: Column, l: Column): Column =
      when(isBlank(c), coalesce(l, c)).otherwise(c)
    val t2 = triples
      .join(labels.toDF("__bs", "__ls"), col("s") === col("__bs"), "left_outer")
      .join(labels.toDF("__bo", "__lo"), col("o") === col("__bo"), "left_outer")
      .select(sub(col("s"), col("__ls")).as("s"), col("p"),
        sub(col("o"), col("__lo")).as("o"))
    Reification.graphDigest(t2)
  }
}
