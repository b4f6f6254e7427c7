package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate/exact nearest-neighbor search over an `array<float>`
  * embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — one scan, no shuffle
  *    until the final k-row sort. The correctness baseline.
  *  - [[lshBucketTopK]]: sign-random-projection LSH — each vector maps
  *    to an 8-bit bucket; search touches only the query's bucket. The
  *    100 TB path: the bucket id is a partitionable key, so at scale the
  *    scan prunes to ~1/256 of the data (trade recall for IO).
  */
object Similarity {

  /** Deterministic ±1 hyperplanes (LCG, fixed seed) — no RNG at plan
    * time, identical across runs and executors. */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Int]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Array.fill(nPlanes, dim)(if (((next() >>> 32) & 1L) == 1L) 1 else -1)
  }

  /** Exact top-k by quantized cosine (bit-stable across engines).
    * `probeId` supplies the query vector. Deterministic tie-break on id.
    * orderBy+limit plans as TakeOrderedAndProject — per-partition top-k
    * then a k-row driver merge, NOT a single-partition global sort; the
    * trailing row_number window runs over just k rows. */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      probeId: Long, k: Int): DataFrame = {
    val qvec = emb.where(col(idCol) === probeId).select(col(vecCol)).head()
      .getSeq[Float](0)
    val q = typedLit(qvec)
    emb.where(col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"), VectorFns.cosineQ(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id").asc)))
  }

  /** 8-bit sign-LSH bucket id for every vector: bit p = sign of
    * dot(vec, plane_p) with ±1 planes. Pure codegen'd expression. */
  def withLshBucket(emb: DataFrame, vecCol: String, nPlanes: Int = 8): DataFrame = {
    val dim = 64
    val planes = hyperplanes(nPlanes, dim)
    val bucket = (0 until nPlanes).map { p =>
      val dotP = aggregate(
        zip_with(col(vecCol), typedLit(planes(p).toSeq),
          (x, s) => x.cast("double") * s.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    emb.withColumn("lsh_bucket", bucket)
  }

  /** ANN top-k: restrict the scan to the probe's LSH bucket, then exact
    * cosine within it. Recall < 1 by construction; at scale the win is
    * reading 1/2^nPlanes of the corpus. */
  def lshBucketTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      probeId: Long, k: Int, nPlanes: Int = 8): DataFrame = {
    val bucketed = withLshBucket(emb, vecCol, nPlanes)
    val probe = bucketed.where(col(idCol) === probeId)
      .select(col(vecCol), col("lsh_bucket")).head()
    val qvec = probe.getSeq[Float](0)
    val qBucket = probe.getLong(1)
    bucketed.where(col("lsh_bucket") === qBucket && col(idCol) =!= probeId)
      .select(col(idCol).as("vec_id"),
        VectorFns.cosineQ(col(vecCol), typedLit(qvec)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id").asc)))
  }
}
