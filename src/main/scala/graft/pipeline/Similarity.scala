package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one scan, no shuffle of the corpus. The
  *    baseline and the verifier for the approximate path.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus hashed once into sign
  *    buckets; queries probe only their bucket. The 100 TB path: candidate
  *    generation is a bucket join (shuffle on bucket id), never all-pairs.
  *
  * All vector math is Catalyst `zip_with`/`aggregate` in double precision —
  * codegen'd, no UDF.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Native codegen'd expression (see [[graft.functions.CosineSimilarity]]);
    * [[cosineHof]] is the composable higher-order-function formulation —
    * same bit-exact result, interpreted (kept as the reference
    * implementation / fallback). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_similarity(a, b)

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (queries ≪ corpus).
    * Output: (qid, nid, rank). Deterministic tiebreak on neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe")))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val scored = c.crossJoin(q)
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim j):
    * a value in [-0.5, 0.5) derived from xxhash64 — identical across runs
    * and executors, no RNG state to ship. */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit(p.toLong) * 131071L + j), lit(100000L)).cast("double") /
      lit(100000.0)) - 0.5

  /** Sign-bucket id from `planes` random hyperplanes. */
  def lshBucket(e: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(e, sequence(lit(0L), size(e).cast("long") - 1),
          (v, j) => v.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: hash corpus + queries into hyperplane sign buckets,
    * compare only within a query's bucket. Recall grows as `planes` shrinks
    * (coarser buckets); verify against [[bruteForceTopK]] on samples. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("ne"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
  }

  /** IVF (inverted-file) approximate search — the other scale path besides
    * hyperplane LSH. Coarse quantization: `nlist` centroids chosen
    * deterministically (the first `nlist` corpus vectors by id — a k-means
    * iteration can refine them later without changing the query plan);
    * every corpus vector is assigned to its nearest centroid (one broadcast
    * pass), queries probe the `nprobe` nearest cells. Candidate generation
    * is a bucket join on cell id — never all-pairs; the probe factor bounds
    * scanned fraction at ~nprobe/nlist of the corpus. */
  def ivfIndex(corpus: DataFrame, nlist: Int): (DataFrame, DataFrame) = {
    val centroids = broadcast(
      corpus.orderBy(col("vec_id").asc).limit(nlist)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent")))
    val w = Window.partitionBy(col("nid")).orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = corpus
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
      .crossJoin(centroids)
      .withColumn("csim", cosine(col("ne"), col("cent")))
      .withColumn("crank", row_number().over(w))
      .where(col("crank") === 1)
      .select(col("cent_id").as("cell"), col("nid"), col("ne"))
    (centroids, assigned)
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (centroids, assigned) = ivfIndex(corpus, nlist)
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cent_id").asc)
    val probes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(centroids)
      .withColumn("csim", cosine(col("qe"), col("cent")))
      .withColumn("crank", row_number().over(wq))
      .where(col("crank") <= nprobe)
      .select(col("cent_id").as("cell"), col("qid"), col("qe"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank").cast("long").as("rank"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold within LSH buckets. */
  def cosineNearDupPairs(df: DataFrame, thresholdPpm: Long,
                         planes: Int = 8): DataFrame = {
    val v = df.select(col("vec_id").as("vid"), col("embedding").as("e"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val l = v.select(col("bucket"), col("vid").as("ida"), col("e").as("ea"))
    val r = v.select(col("bucket"), col("vid").as("idb"), col("e").as("eb"))
    l.join(r, Seq("bucket"))
      .where(col("ida") < col("idb"))
      .withColumn("sim_ppm",
        floor(cosine(col("ea"), col("eb")) * 1000000.0).cast("long"))
      .where(col("sim_ppm") >= thresholdPpm)
      .select("ida", "idb", "sim_ppm")
      .dropDuplicates("ida", "idb")
  }
}
