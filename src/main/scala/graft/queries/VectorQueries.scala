package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import Q._

/** Similarity-search coverage over the `embeddings` table: exact
  * brute-force cosine top-k (oracle-checked via fixed-point quantized
  * cosine, bit-identical cross-engine) and the LSH-bucketed ANN variant
  * (the 100 TB scale path; rows-only check, recall asserted in tests).
  */
object VectorQueries {

  private val K = 10

  /** DuckDB CTEs mirroring [[graft.operators.Similarity.quantizeInt8]]:
    * `v(vec_id, qv)` with int8-quantized BIGINT lanes. */
  private val sqlQuantized: String =
    """q AS (SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      |  FROM embeddings),
      |v AS (SELECT vec_id,
      |    CASE WHEN mx = 0
      |         THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
      |         ELSE list_transform(embedding,
      |           x -> CAST(FLOOR((CAST(x AS DOUBLE) * 127.0) / mx) AS BIGINT))
      |    END AS qv
      |  FROM q)""".stripMargin

  /** DuckDB fixed-point dot product mirror of
    * [[graft.functions.VectorFns.dotQ]]. */
  private def sqlDotQ(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a) + 1),
       |  i -> CAST(FLOOR(CAST($a[i] AS DOUBLE) * 1000) AS BIGINT)
       |     * CAST(FLOOR(CAST($b[i] AS DOUBLE) * 1000) AS BIGINT)))""".stripMargin

  val queries: Map[String, QFn] = Map(
    // Exact top-k nearest neighbors of vec 0 by (quantized) cosine.
    "q_embedding_topk" -> { (s, dir) =>
      Similarity.bruteForceTopK(s, t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = K)
        .select(col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
    },

    // ANN: same probe, but the scan is pruned to the probe's 8-bit
    // sign-LSH bucket. Rows-only (bucket contents depend on the LSH
    // planes); recall vs brute force is asserted in SimilaritySpec.
    "q_ann_lsh" -> { (s, dir) =>
      Similarity.lshBucketTopK(s, t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = K)
        .select(col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
    },

    // IVF ANN: k-means coarse quantizer (3 Lloyd iterations, k=16),
    // probe the 4 nearest inverted lists, exact rescore. Rows-only
    // (centroids are engine-internal); recall vs brute force asserted
    // in SimilaritySpec.
    "q_ann_ivf" -> { (s, dir) =>
      Similarity.ivfTopK(s, t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = K)
        .select(col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
    },

    // Embedding-cosine near-duplicate pairs, exact all-pairs baseline
    // (the LSH variant below is the scale path).
    "q_neardup_exact" -> { (s, dir) =>
      Similarity.nearDupPairsExact(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.40)
    },

    // Banded sign-LSH near-dup: candidates from an equi-join on
    // (band, bucket) keys, exact rescore. Rows-only (bucket membership
    // depends on engine-internal planes); recall asserted in
    // SimilaritySpec with planted duplicates.
    "q_neardup_lsh" -> { (s, dir) =>
      Similarity.nearDupPairsLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.40)
    },

    // Per-label embedding centroids (average pooling) — fixed-point
    // means, bit-exact across engines.
    "q_vector_centroid" -> { (s, dir) =>
      Similarity.labelCentroids(t(s, dir, "embeddings"), "label", "embedding")
    },

    // Per-vector array ops: length, endpoints, quantized norm — scalar
    // array functions with exact cross-engine semantics.
    "q_vector_stats" -> { (s, dir) =>
      import graft.functions.VectorFns
      t(s, dir, "embeddings").select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        element_at(col("embedding"), -1).cast("double").as("last_val"),
        VectorFns.dotQ(col("embedding"), col("embedding")).as("qnorm2"),
        col("label"))
    },

    // Symmetric int8 quantization (per-vector max-abs scale): the
    // 4x-compression step of a quantized ANN index. Deterministic
    // float→int mapping, bit-exact cross-engine; the lane values are
    // serialized to a string (array columns break the driver compare).
    "q_vec_quantize" -> { (s, dir) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"),
          array_join(transform(col("qvec"), _.cast("string")), ",").as("qvec_str"),
          aggregate(col("qvec"), lit(0L), (a, v) => a + v).as("qsum"),
          array_max(col("qvec")).as("qmax"))
    },

    // Top-k neighbors by QUANTIZED cosine — int8 index rescoring
    // arithmetic, exactly mirrored in SQL.
    "q_quant_topk" -> { (s, dir) =>
      Similarity.quantizedTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          probeId = 0L, k = K)
        .select(col("vec_id"), col("qcos"), col("rk").cast("long").as("rk"))
    })

  val oracles: Map[String, String] = Map(
    "q_embedding_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id,
         |    ${sqlDotQ("e.embedding", "q.qe")} AS dot,
         |    ${sqlDotQ("e.embedding", "e.embedding")} AS na,
         |    ${sqlDotQ("q.qe", "q.qe")} AS nq
         |  FROM embeddings e, q WHERE e.vec_id <> 0)
         |SELECT vec_id,
         |  CAST(dot AS DOUBLE) / SQRT(CAST(na * nq AS DOUBLE)) AS cos_sim,
         |  CAST(row_number() OVER (
         |    ORDER BY CAST(dot AS DOUBLE) / SQRT(CAST(na * nq AS DOUBLE)) DESC, vec_id) AS BIGINT) AS rk
         |FROM d QUALIFY rk <= $K""".stripMargin,

    "q_neardup_exact" ->
      s"""WITH d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${sqlDotQ("a.embedding", "b.embedding")} AS dot,
         |    ${sqlDotQ("a.embedding", "a.embedding")} AS na,
         |    ${sqlDotQ("b.embedding", "b.embedding")} AS nb
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b,
         |  CAST(dot AS DOUBLE) / SQRT(CAST(na * nb AS DOUBLE)) AS cos_sim
         |FROM d
         |WHERE CAST(dot AS DOUBLE) / SQRT(CAST(na * nb AS DOUBLE)) >= 0.40""".stripMargin,

    "q_vector_centroid" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS pos,
        |  CAST(CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*) AS mean_q,
        |  COUNT(*) AS n
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
        |GROUP BY label, i""".stripMargin,

    "q_vector_stats" ->
      s"""SELECT vec_id,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  CAST(embedding[1] AS DOUBLE) AS first_val,
         |  CAST(embedding[-1] AS DOUBLE) AS last_val,
         |  CAST(${sqlDotQ("embedding", "embedding")} AS BIGINT) AS qnorm2,
         |  label
         |FROM embeddings""".stripMargin,

    "q_vec_quantize" ->
      s"""WITH $sqlQuantized
         |SELECT vec_id, array_to_string(qv, ',') AS qvec_str,
         |  CAST(list_sum(qv) AS BIGINT) AS qsum,
         |  CAST(list_max(qv) AS BIGINT) AS qmax
         |FROM v""".stripMargin,

    "q_quant_topk" ->
      s"""WITH $sqlQuantized,
         |p AS (SELECT qv AS pq FROM v WHERE vec_id = 0),
         |d AS (SELECT v.vec_id,
         |    CAST(list_sum(list_transform(range(1, len(v.qv) + 1),
         |      i -> v.qv[i] * p.pq[i])) AS BIGINT) AS dot,
         |    CAST(list_sum(list_transform(v.qv, x -> x * x)) AS BIGINT) AS na,
         |    CAST(list_sum(list_transform(p.pq, x -> x * x)) AS BIGINT) AS nq
         |  FROM v, p WHERE v.vec_id <> 0)
         |SELECT vec_id, CAST(dot AS DOUBLE) / SQRT(CAST(na * nq AS DOUBLE)) AS qcos,
         |  CAST(row_number() OVER (
         |    ORDER BY CAST(dot AS DOUBLE) / SQRT(CAST(na * nq AS DOUBLE)) DESC,
         |    vec_id) AS BIGINT) AS rk
         |FROM d QUALIFY rk <= $K""".stripMargin)
}
