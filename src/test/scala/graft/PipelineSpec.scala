package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextAnalysis}

/** Training-pipeline assembly ops: sequence packing and deterministic
  * split assignment. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: concat-and-chunk bins by first-token position") {
    // shard 0: doc 0 (3 toks), doc 1 (4 toks), doc 2 (2 toks); budget 5
    val docs = Seq((0L, "a b c"), (1L, "d e f g"), (2L, "h i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        budget = 5, docsPerShard = 100)
      .select("doc_id", "shard", "n_tokens", "start_tok", "bin")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 0L, 3L, 0L, 0L), // starts at token 0 -> bin 0
      (1L, 0L, 4L, 3L, 0L), // starts at 3, straddles into bin 1
      (2L, 0L, 2L, 7L, 1L))) // starts at 7 -> bin 1
  }

  test("packSequences: shards pack independently") {
    val docs = Seq((0L, "a b c"), (1L, "d e"), (100L, "x y z w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        budget = 4, docsPerShard = 100)
      .select("doc_id", "shard", "start_tok", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 100 opens shard 1 at token 0 regardless of shard 0's fill
    assert(got.toSeq === Seq((0L, 0L, 0L, 0L), (1L, 0L, 3L, 0L),
      (100L, 1L, 0L, 0L)))
  }

  test("chunkDocs: overlapping windows, short tail, sub-chunk doc") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 11).map(i => "w" * i).mkString(" ")), // 11 letter tokens
      (2L, "a b c"),                                   // shorter than chunk
      (3L, "")).toDF("doc_id", "text")                 // empty: no chunks
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: full windows at 0,3,6; short tail at 9 covers tokens 10-11
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 2L)))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L)))
    assert(!got.exists(_._1 == 3L))
    // overlap: chunk i starts stride into chunk i-1; content hash of a
    // known window matches a direct computation
    val h = TextAnalysis.chunkDocs(docs.where(col("doc_id") === 1L),
        "doc_id", "text", 4, 3)
      .where(col("chunk_idx") === 1L).select("chunk_md5").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(Seq("w" * 4, "w" * 5, "w" * 6, "w" * 7).mkString(" ")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h === want)
  }

  test("splitAssign: partitions are exhaustive, disjoint, and reproducible") {
    val df = spark.range(0, 5000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Relational.splitAssign(df, col("id"), splits)
    val counts = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 5000L)
    // md5 is uniform: each split lands within 20% of its expectation
    assert(math.abs(counts("train") - 4000L) < 800,
      s"train=${counts("train")}")
    assert(counts("val") > 250 && counts("test") > 250)
    // reproducible: a second run assigns identically
    val again = Relational.splitAssign(df, col("id"), splits)
    assert(got.select("id", "split").except(again.select("id", "split"))
      .count() === 0L)
    // consistent with the sampler: split 'train' == deterministicSample(0.8)
    val sampled = Relational.deterministicSample(df, col("id"), 0.8)
      .select("id").as[Long].collect().toSet
    val trainIds = got.where(col("split") === "train")
      .select("id").as[Long].collect().toSet
    assert(trainIds === sampled)
  }

  test("splitAssign rejects fractions that do not sum to 1") {
    val df = spark.range(0, 10).toDF("id")
    intercept[IllegalArgumentException] {
      Relational.splitAssign(df, col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }
}
