package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.FastHash.md5 // shadows functions.md5 → Md5Fast (r19)

/** End-to-end training-data preparation: the §E/§G operators composed
  * into the pipeline a real corpus run executes — one declarative
  * plan, so Catalyst sees (and optimizes) the whole flow instead of
  * materialized stage boundaries.
  */
object Pipeline {

  /** quality-filter → exact-dedup (keep the minimum doc_id per text
    * hash) → token-window chunking, emitting compact chunk
    * fingerprints. Shape notes: the quality filter is a narrow pass;
    * the dedup keep-list is one hash aggregation; chunking explodes
    * per-row. No driver-side loops, nothing quadratic.
    */
  def prepare(docs: DataFrame, minScore: Double = 0.5): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .filter(col("score") >= minScore)
      .select(col("doc_id"))
    val keep = docs
      .join(scored, Seq("doc_id"), "left_semi")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val kept = docs.join(keep, Seq("doc_id"), "left_semi")
    TextAnalysis.chunk(kept)
      .select(col("doc_id"), col("chunk_idx"),
        md5(col("chunk").cast("binary")).as("chunk_md5"))
  }

  /** Per-stage reject funnel — the report a corpus build publishes
    * beside its output: how many documents entered each stage, how
    * many each rule rejected, how many survived. [[corpusBuild]]
    * emits the kept corpus; this emits the ACCOUNTING (a pipeline
    * whose reject counts aren't on record can't be debugged when the
    * mix shifts). Stages: Gopher quality rules, then exact dedup
    * (min-doc_id keeper per text hash). Three count aggregates on
    * broadcast single-row frames exploded into the stage rows — the
    * corpus is scanned once per stage, no text column ever shuffles
    * except the dedup keep-list hash.
    */
  def rejectFunnel(docs: DataFrame): DataFrame = {
    val gKeep = TextAnalysis.gopherQuality(docs)
      .filter(col("keep")).select(col("doc_id"))
    val kept = docs.join(gKeep, Seq("doc_id"), "left_semi")
    val dedupKeep = kept
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val c0 = docs.agg(count(lit(1)).as("c0"))
    val c1 = kept.agg(count(lit(1)).as("c1"))
    val c2 = dedupKeep.agg(count(lit(1)).as("c2"))
    c0.crossJoin(broadcast(c1)).crossJoin(broadcast(c2))
      .select(explode(array(
        struct(lit("gopher_quality").as("stage"),
          col("c0").as("n_in"), col("c1").as("n_out")),
        struct(lit("exact_dedup").as("stage"),
          col("c1").as("n_in"), col("c2").as("n_out")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_in").as("n_in"),
        col("r.n_out").as("n_out"),
        (col("r.n_in") - col("r.n_out")).as("n_rejected"))
  }

  /** The full corpus build: Gopher quality rules → exact dedup (keep
    * the minimum doc_id per text hash) → target-mixture domain
    * sampling → train/val/test split. Each stage is the §G operator
    * itself, composed into one declarative plan: two hash
    * aggregations (dedup keep-list, per-source counts) and broadcast
    * rate/split logic over narrow scans — the corpus never shuffles
    * its text column after the dedup keep-list.
    */
  def corpusBuild(docs: DataFrame,
                  weights: Map[String, Double] =
                    Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)): DataFrame = {
    // minStop relaxed to 1: the synthetic corpus vocabulary carries at
    // most one of the Gopher stopwords, and a pipeline that filters
    // everything demonstrates nothing
    val quality = TextAnalysis.gopherQuality(docs, minStop = 1)
      .filter(col("keep")).select(col("doc_id"))
    val qualified = docs.join(quality, Seq("doc_id"), "left_semi")
    val keep = qualified
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
    val mixed = deduped.join(
      TextAnalysis.mixToTarget(deduped, weights), Seq("doc_id", "source"),
      "left_semi")
    TextAnalysis.assignSplit(mixed)
  }

  /** The token-budget corpus build — [[corpusBuild]] rebuilt from the
    * r9 operator generation: Gopher quality rules → paragraph-level
    * dedup survival (docs keeping ≥ `minKeptFrac` of their tokens
    * after corpus-wide chunk dedup — substring-aware, where
    * corpusBuild's exact dedup only catches identical docs) →
    * mixture by TOKEN budget → k-fold assignment. One declarative
    * plan; the only corpus-wide shuffle is the chunk-hash keeper fold
    * (everything downstream is broadcast rates and map-side hashes).
    */
  def tokenCorpusBuild(docs: DataFrame,
                       weights: Map[String, Double] =
                         Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
                       minKeptFrac: Double = 0.5): DataFrame = {
    val quality = TextAnalysis.gopherQuality(docs, minStop = 1)
      .filter(col("keep")).select(col("doc_id"))
    val qualified = docs.join(quality, Seq("doc_id"), "left_semi")
    val surviving = qualified.join(
      Dedup.paragraphDedup(qualified)
        .filter(col("kept_frac") >= minKeptFrac).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    TextAnalysis.mixToTokenBudget(surviving, weights)
      .join(TextAnalysis.kfoldAssign(surviving), "doc_id")
      .select(col("doc_id"), col("source"), col("n_toks"), col("fold"))
  }

  /** Dataset profile — the QA summary a curation run records before
    * and after every transform: per column, row/null/distinct counts
    * plus min/max lengths (string columns measure length; numeric
    * columns their value). One aggregation per column over a narrow
    * scan, unioned — each count_distinct is its own partial-agg
    * shuffle of one column, never a row-wide distinct. Integer-only
    * output, deterministic on any engine.
    */
  def dataProfile(docs: DataFrame): DataFrame = {
    val cols = docs.columns.toSeq
    cols.map { c =>
      val metric = docs.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType => length(col(c))
        case _ => col(c)
      }
      docs.agg(
        count(lit(1)).as("n_rows"),
        count(lit(1)).minus(count(col(c))).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(metric).cast("long").as("min_len"),
        max(metric).cast("long").as("max_len"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_len"), col("max_len"))
    }.reduce(_.unionByName(_))
  }
}
