package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FastHash.md5 // shadows functions.md5 → Md5Fast (r19)

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, a decode/feature-extract stage, and frame sampling.
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-features from
  * the raw bytes. The Spark-side plumbing is real — binary column +
  * metadata schema, typed Dataset, per-partition batch decode via
  * mapPartitions (the shape a JNI/FFmpeg decoder would use), and
  * pure-SQL frame sampling.
  *
  * Payloads are synthesized from the documents table's text bytes
  * (UTF-8; the corpus is ASCII so byte arithmetic is reproducible in
  * the SQL oracle).
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte], mime: String)
  final case class Features(doc_id: Long, byte_len: Int, first_byte: Int,
                            last_byte: Int, checksum: Long,
                            width: Int, height: Int)

  /** documents → (doc_id, payload binary, mime, byte_len) view. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))
      // length over the binary column = UTF-8 octets, which is what
      // the decoded Features.byte_len reports too (char count would
      // silently diverge on non-ASCII text)
      .withColumn("byte_len", length(col("payload")))

  /** The fake codec: deterministic features from raw bytes. A real
    * build swaps this body for the native decoder call; the batch
    * shape (one JVM-side iterator per partition, no per-row setup)
    * is exactly what that decoder would need.
    */
  private def decodeStub(p: Payload): Features = {
    val len = p.payload.length
    // empty payloads decode to zero features instead of crashing the task
    val first = if (len == 0) 0 else p.payload.head & 0xff
    val last = if (len == 0) 0 else p.payload.last & 0xff
    val checksum = 31L * len + first + last
    Features(p.doc_id, len, first, last, checksum,
      width = (checksum % 640L).toInt, height = (checksum % 480L).toInt)
  }

  /** Deterministic pseudo-embedding of a binary payload — the encoder
    * stub of a multimodal retrieval pipeline (a real build swaps the
    * hash for a vision/audio model; the plumbing — payload digest →
    * fixed-dim double vector, exact k/1000 rationals so every engine
    * agrees bit-for-bit — is the real part). One narrow codegen'd
    * pass.
    */
  def embedStub(docs: DataFrame, dims: Int = 16): DataFrame =
    payloads(docs).select(col("doc_id"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        (conv(substring(md5(concat(md5(col("payload")), lit("_"),
          d.cast("string")).cast("binary")), 1, 4), 16, 10).cast("long")
          % 2000 - 1000) / 1000.0).as("emb"))

  /** Multimodal retrieval: embed the payloads, then exact top-k by
    * cosine against one payload's embedding — [[embedStub]] composed
    * with the [[Similarity]] scan shape (broadcast query vector, one
    * pass, TakeOrderedAndProject).
    */
  def embedTopK(docs: DataFrame, queryDoc: Long = 0L, k: Int = 10): DataFrame = {
    val emb = embedStub(docs)
    val q = broadcast(emb.filter(col("doc_id") === queryDoc)
      .select(col("emb").as("qv")))
    emb.filter(col("doc_id") =!= queryDoc)
      .crossJoin(q)
      .withColumn("cos", Similarity.cosine(col("emb"), col("qv")))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"))
  }

  /** Magic-byte modality dispatch — the first stage of every
    * multimodal ingest: classify each opaque payload by its leading
    * bytes (the real-world JPEG/PNG/RIFF sniff) and report per-
    * modality volume. Payload headers are synthesized (doc_id mod 3
    * picks a 4-byte ASCII magic prepended to the text bytes), but the
    * CLASSIFIER is the real operator: it reads ONLY the prefix — a
    * codegen'd substring over the binary column, one narrow pass, no
    * decode — and dispatches on it, exactly how a 100 TB ingest
    * routes payloads to per-modality decoder pools without touching
    * payload bodies. All-integer report columns.
    */
  def modalityReport(docs: DataFrame): DataFrame = {
    val tagged = payloads(docs).select(col("doc_id"),
      concat(
        when(col("doc_id") % 3 === 0, lit("JPG0"))
          .when(col("doc_id") % 3 === 1, lit("PNG0"))
          .otherwise(lit("RIFF")).cast("binary"),
        col("payload")).as("payload"))
    tagged
      .select(
        when(substring(col("payload"), 1, 4) === lit("JPG0").cast("binary"),
          "image/jpeg")
          .when(substring(col("payload"), 1, 4) === lit("PNG0").cast("binary"),
            "image/png")
          .when(substring(col("payload"), 1, 4) === lit("RIFF").cast("binary"),
            "audio/wav")
          .otherwise("unknown").as("modality"),
        length(col("payload")).cast("long").as("bytes"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("total_bytes"),
        min(col("bytes")).as("min_bytes"), max(col("bytes")).as("max_bytes"))
  }

  /** Binary payload column → per-doc feature rows. */
  def binaryFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    payloads(docs)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[Payload]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Stub "resize": byte-stride downsampling — keep the first of
    * every `factor` payload bytes (the codec-free analog of image
    * downscaling; a real build decodes, scales, re-encodes inside
    * the same one-pass projection). One codegen'd regexp per row,
    * no shuffle. Regex '.' excludes newlines identically in Java
    * and RE2, so the oracle reproduces the output byte-for-byte.
    */
  def resizeStub(docs: DataFrame, factor: Int = 4): DataFrame =
    docs
      .select(col("doc_id"),
        regexp_replace(col("text"), s"(.).{0,${factor - 1}}", "$1").as("resized"))
      .select(col("doc_id"),
        length(col("resized")).cast("long").as("out_len"),
        md5(col("resized").cast("binary")).as("out_md5"))

  /** Overlapping analysis windows over the byte stream — the audio
    * framing shape (window / hop), with a deterministic per-window
    * "energy" (sum of byte values) standing in for the real DSP. The
    * explode is the only row multiplier; the inner fold is a fused
    * codegen kernel ([[graft.functions.ByteSums.byteWindowSum]],
    * value-identical to the aggregate/substr/ascii HOF tree it
    * replaces — r20, guide step 4: that tree ran interpreted with one
    * substr allocation per byte), so the pass stays narrow AND
    * codegen'd at corpus scale.
    */
  def audioWindows(docs: DataFrame, winBytes: Int = 32,
                   hop: Int = 16): DataFrame =
    docs
      .filter(length(col("text")) >= winBytes)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - winBytes, lit(hop)))
          .as("s"))
      .select(col("doc_id"),
        (col("s") / hop).cast("long").as("win_idx"),
        graft.functions.ByteSums.byteWindowSum(col("text"), col("s"), winBytes)
          .as("energy"))

  /** Stub PERCEPTUAL hash (block-mean aHash shape): the payload is
    * cut into 64 equal byte blocks, each block's byte-sum is compared
    * against the global mean (64·blockSum > total — strict integer
    * compare, no division), and the 64 sign bits form the signature,
    * carried as four 16-bit chunks like [[Dedup.simhashChunks]]. A
    * real build swaps the byte-sum for DCT coefficients of the
    * decoded image; the structure — fixed block partition → per-block
    * statistic → sign-vs-mean bits → chunked 64-bit code — IS
    * pHash's, and everything around it (the narrow one-pass scan,
    * the band-join pairing) is the production path. Payloads shorter
    * than one byte per block are skipped (no decodable "image").
    */
  def phashChunks(docs: DataFrame, blocks: Int = 64): DataFrame = {
    val len = length(col("text"))
    // block bounds by exact floor division: len·k/64 is a power-of-two
    // divide of an integer-valued double → floor is engine-exact.
    // The per-block sums run as one fused codegen kernel
    // ([[graft.functions.ByteSums.byteBlockSums]], same double-floor
    // bounds, value-identical to the transform/aggregate HOF tree it
    // replaces — r20, guide step 4: that tree ran interpreted, one
    // substr allocation + lambda dispatch per BYTE of the payload).
    val sums = graft.functions.ByteSums.byteBlockSums(col("text"), blocks)
    docs.filter(len >= blocks)
      .select(col("doc_id"), sums.as("s"))
      .withColumn("total", aggregate(col("s"), lit(0L), _ + _))
      .select(col("doc_id") +: (0 until 4).map { c =>
        (0 until 16).map(b =>
          when(element_at(col("s"), c * 16 + b + 1) * 64 > col("total"),
            lit(1 << b)).otherwise(lit(0)))
          .reduce(_ + _).as(s"c$c")
      }: _*)
  }

  /** Multimodal near-dup detection: perceptual-hash signatures paired
    * by the shared chunk band join ([[Dedup.chunkPairs]]) under a
    * Hamming budget — visually-similar payloads (here: byte-profile-
    * similar) surface as pairs without any quadratic scan.
    */
  def phashPairs(docs: DataFrame, maxHam: Int = 3): DataFrame =
    Dedup.chunkPairs(phashChunks(docs), maxHam)

  /** Treat the payload as fixed-size frames; sample every `stride`-th
    * frame and fingerprint it. Pure column expressions (sequence with
    * step + explode), no driver loop.
    */
  /** Cross-video duplicated-frame screen: of each video's sampled
    * frames, how many carry a hash that ALSO appears in another
    * video — the static-intro/logo/slate signal a video corpus
    * dedups on (whole-file hashes miss shared segments; per-frame
    * hashes catch them). Composition of [[frameSample]] with a
    * frame-hash df fold: the hash-count shuffle is keyed by the
    * digest (map-side combined), the per-video rollup by doc —
    * never frame×frame. Within-video repeats (a freeze-frame) don't
    * count as cross-dup: the hash must appear under ≥2 distinct
    * docs.
    */
  def dupFrames(docs: DataFrame): DataFrame = {
    val frames = frameSample(docs)
    val hashDocs = frames.select(col("frame_md5"), col("doc_id")).distinct()
      .groupBy(col("frame_md5")).agg(count(lit(1)).as("n_docs"))
    frames.join(hashDocs, "frame_md5")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("dup_frames"))
      .withColumn("dup_frac",
        round(col("dup_frames").cast("double") /
          col("n_frames").cast("double"), 6))
  }

  /** Scene-cut detection over the sampled frame stream: a cut is a
    * consecutive-frame pair whose 64-bit frame fingerprints differ in
    * more than `cutBits` bits — frame-difference hashing, the
    * classic shot-boundary heuristic (on real video the fingerprint
    * would be a perceptual hash from the decoder; here it derives
    * from the frame digest, same plumbing). Hamming runs over the
    * simhash 4×16-bit chunk layout with bit_count — exact integers.
    *
    * Scale shape: frames explode linearly, the lag runs inside a
    * doc-keyed window (per-partition state = one previous frame), the
    * rollup is a partial-agg fold — never frame×frame (r11).
    */
  def sceneCuts(docs: DataFrame, cutBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunkCols = (0 until 4).map(c =>
      conv(substring(col("frame_md5"), 1 + 4 * c, 4), 16, 10)
        .cast("int").as(s"c$c"))
    val chunks = frameSample(docs)
      .select(col("doc_id") +: col("frame_idx") +: chunkCols: _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val withPrev = (0 until 4).foldLeft(chunks)((df, c) =>
      df.withColumn(s"p$c", lag(col(s"c$c"), 1).over(w)))
    val ham = (0 until 4).map(c =>
      bit_count(col(s"c$c").bitwiseXOR(col(s"p$c")).cast("long")))
      .reduce(_ + _)
    withPrev
      .withColumn("ham", ham) // null on each doc's first frame
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        coalesce(sum(when(col("ham") > cutBits, 1L).otherwise(0L)), lit(0L))
          .as("n_cuts"))
  }

  def frameSample(docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    docs
      .filter(length(col("text")) >= frameBytes)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          (floor(length(col("text")) / frameBytes) - 1).cast("int"),
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .cast("binary")).as("frame_md5"))
}
