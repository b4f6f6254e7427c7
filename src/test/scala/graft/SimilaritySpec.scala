package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine: self-similarity is 1, orthogonal is 0, opposite is -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)).toDF("a", "b", "want")
    val got = df.select(VectorFns.cosine(col("a"), col("b")).as("c"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("quantized cosine tracks true cosine within quantization error") {
    val rows = emb.limit(50)
      .select(VectorFns.cosine(col("embedding"), col("embedding")).as("c"),
        VectorFns.cosineQ(col("embedding"), col("embedding")).as("cq"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
      assert(math.abs(r.getDouble(1) - 1.0) < 2e-2)
    }
  }

  test("bruteForceTopK: k rows, ranked by descending similarity, probe excluded") {
    val top = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", 0L, 10)
      .orderBy("rk").collect()
    assert(top.length === 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("lshBucketTopK results are a subset of a wider brute-force ranking") {
    val brute = Similarity.bruteForceTopK(spark, emb, "vec_id", "embedding", 0L, 200)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Similarity.lshBucketTopK(spark, emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ann.nonEmpty, "probe bucket must contain neighbors")
    // every ANN hit is a genuinely similar vector (top-200 of 500)
    assert(ann.forall(brute.contains))
  }

  test("lsh bucket ids are stable across invocations (deterministic planes)") {
    val b1 = Similarity.withLshBucket(emb, "embedding")
      .select("vec_id", "lsh_bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.withLshBucket(emb, "embedding")
      .select("vec_id", "lsh_bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
    assert(b1.values.toSet.size > 1, "vectors should spread across buckets")
  }
}
