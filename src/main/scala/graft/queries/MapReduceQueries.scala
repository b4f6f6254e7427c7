package graft.queries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.engine.MapReduce
import Q._

/** The reference's own query surface (SURVEY §2.1): the generalized
  * Map/Reduce contract exercised through typed Datasets — `flatMap` as
  * the Map phase (`mpWorker/worker.go:21`), `groupByKey`+`mapGroups` /
  * a Catalyst `Aggregator` as the Reduce phase the reference stubbed
  * (`mpWorker/worker.go:207-209`).
  */
object MapReduceQueries {

  val queries: Map[String, QFn] = Map(
    // Pure Map phase: a typed flatMap fanning each document into
    // (long-word, doc_id) pairs — projection + filter as the Map UDF.
    "q_map_flat" -> { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
      MapReduce.mapFlat(docs) { case (id, text) =>
        text.split("[^\\p{L}]+").iterator
          .filter(w => w.nonEmpty && w.length >= 6)
          .map(w => (w, id))
      }.toDF("word", "doc_id")
    },

    // Reduce with the reference's exact shape: the user function sees
    // the full value list per key (string-typed, like KeyValue).
    "q_reduce_fold" -> { (s, dir) =>
      import s.implicits._
      val pairs = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("string"))
        .as[(String, String)]
      MapReduce.reduceByKey(pairs) { (_, vs) =>
        // quantities are integral doubles: the fold is exact.
        vs.map(_.toDouble).sum.toLong
      }.toDF("key", "total_qty")
    },

    // Partition-count invariance (fixes SURVEY §1.4-Q5): the same fold
    // through an associative Aggregator UDAF after an explicit odd
    // repartition — the result must not depend on partitioning.
    "q_part_invariance" -> { (s, dir) =>
      val sumFold = udaf(new MapReduce.FoldAggregator[Double, Double, Double](
        0.0, _ + _, _ + _, identity)(Encoders.scalaDouble, Encoders.scalaDouble))
      t(s, dir, "lineitem")
        .repartition(7, col("l_returnflag"))
        .groupBy(col("l_returnflag").as("key"))
        .agg(sumFold(col("l_quantity")).cast("long").as("total_qty"))
    })

  val oracles: Map[String, String] = Map(
    "q_map_flat" ->
      """SELECT w AS word, doc_id FROM (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |      x -> x <> '' AND length(x) >= 6)) AS w
        |  FROM documents)""".stripMargin,

    "q_reduce_fold" ->
      """SELECT l_returnflag AS key, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_part_invariance" ->
      """SELECT l_returnflag AS key, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
