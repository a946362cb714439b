package graft.textops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (`array<float>`, dim 64):
  * brute-force cosine top-k as the exact baseline, and a sign-LSH bucketed
  * variant as the scale path (axis-aligned random-hyperplane LSH: the sign
  * pattern of the first [[LshBits]] dimensions is the bucket key). All
  * arithmetic in double with a frozen summation order so the DuckDB oracle
  * reproduces values bit-closely (results rounded to 6 dp).
  */
object Similarity {

  val QueryVecId = 0L
  val TopK = 10
  val LshBits = 4
  val NearDupCosine = 0.35

  def loadEmb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def dbl(c: Column): Column = c.cast("array<double>")

  /** Left-fold dot product — matches DuckDB's
    * `list_sum(list_transform(range(n), i -> a[i+1]*b[i+1]))`.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-pattern LSH bucket over the first `bits` dimensions. */
  def signBucket(emb: Column, bits: Int = LshBits): Column =
    (0 until bits).map { j =>
      when(element_at(emb, j + 1) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force cosine top-k vs the query vector (vec_id = QueryVecId).
    * The query row broadcasts; the scan stays partition-parallel and the
    * global top-k is a TakeOrderedAndProject — no full sort.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = loadEmb(spark, sfDir)
    val q = emb.where(col("vec_id") === QueryVecId)
      .select(dbl(col("embedding")).as("qv"))
    emb.where(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(dbl(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(TopK)
  }

  /** Sign-LSH top-k: only vectors in the query's sign bucket are scored.
    * At scale the bucket column is the partition key of a pre-bucketed
    * index table; the probe prunes to one bucket.
    */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = loadEmb(spark, sfDir)
      .withColumn("bucket", signBucket(dbl(col("embedding"))))
    val q = emb.where(col("vec_id") === QueryVecId)
      .select(dbl(col("embedding")).as("qv"), col("bucket").as("qbucket"))
    emb.where(col("vec_id") =!= QueryVecId)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("label"),
        round(cosine(dbl(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(TopK)
  }

  /** Embedding-cosine near-dup pairs inside sign-LSH buckets: the bucket
    * join bounds the candidate set; exact cosine >= [[NearDupCosine]]
    * verifies. Same shape as MinHash-LSH, over vectors.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = loadEmb(spark, sfDir)
      .select(col("vec_id"), dbl(col("embedding")).as("e"))
      .withColumn("bucket", signBucket(col("e")))
    val a = emb.select(col("vec_id").as("id_a"), col("e").as("e_a"), col("bucket"))
    val b = emb.select(col("vec_id").as("id_b"), col("e").as("e_b"), col("bucket"))
    a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("e_a"), col("e_b")), 6).as("sim"))
      .where(col("sim") >= NearDupCosine)
      .orderBy("id_a", "id_b")
  }
}
