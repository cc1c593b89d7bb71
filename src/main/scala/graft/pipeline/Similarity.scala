package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Brute force is one narrow pass + TakeOrderedAndProject; the LSH and
  * IVF variants bound the scored candidate set (bucket / probed
  * partitions), which is what survives when "500 vectors" becomes
  * "50 billion": candidate generation is a key lookup, scoring is
  * proportional to candidates, not corpus.
  */
object Similarity {

  /** Cosine over two array<double> columns: a fused native Catalyst
    * expression (one loop, no intermediate arrays, whole-stage
    * codegen) — see [[graft.functions.CosineSimilarity]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** The composable functions._ form (zip_with + aggregate), kept as
    * the reference implementation the native expression is tested
    * against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  private def vecs(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** The deterministic query vector: embedding of `queryId`. A single
    * row — broadcast into every variant.
    */
  private def queryVec(embeddings: DataFrame, queryId: Long): DataFrame =
    broadcast(vecs(embeddings).filter(col("vec_id") === queryId)
      .select(col("v").as("qv")))

  /** Exact top-k by cosine vs the query vector; (vec_id, rank). */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame =
    vecs(embeddings)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(queryVec(embeddings, queryId))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"))

  /** Deterministic ±1 hyperplane coefficients from md5(plane_dim). */
  private[pipeline] def hyperplane(plane: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { d =>
      val h = md.digest(s"${plane}_$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane LSH: bucket = sign-bit string over `planes`
    * hyperplanes; candidates share the query's bucket; exact top-k
    * within.
    */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int,
              planes: Int = 8, dims: Int = 64): DataFrame = {
    val coefs = (0 until planes).map(p => typedLit(hyperplane(p, dims)))
    def bucket(v: Column): Column =
      concat(coefs.map(c =>
        when(aggregate(zip_with(v, c, (x, y) => x * y), lit(0.0), (a, x) => a + x) >= 0,
          "1").otherwise("0")): _*)
    val e = vecs(embeddings).withColumn("bucket", bucket(col("v")))
    val q = broadcast(e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket")))
    e.filter(col("vec_id") =!= queryId)
      .join(q, col("bucket") === col("qbucket"))
      .withColumn("cos", cosine(col("v"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
  }

  /** IVF-style: centroids = per-label mean vectors ("trained"
    * partition assignment), probe the `nprobe` centroids nearest the
    * query, exact top-k within the probed partitions.
    */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nprobe: Int = 2): DataFrame = {
    val e = vecs(embeddings)
    val centroids = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), s => s.getField("m")).as("cv"))
    val q = queryVec(embeddings, queryId)
    val probed = broadcast(centroids.crossJoin(q)
      .withColumn("cdist", cosine(col("cv"), col("qv")))
      .orderBy(col("cdist").desc, col("label"))
      .limit(nprobe)
      .select(col("label")))
    e.filter(col("vec_id") =!= queryId)
      .join(probed, Seq("label"), "left_semi")
      .crossJoin(q)
      .withColumn("cos", cosine(col("v"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"))
  }
}
