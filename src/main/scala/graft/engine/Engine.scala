package graft.engine

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The engine's public job-submission API — the Spark-native equivalent
  * of the reference's client surface (`mpClient/client.go:25-33`
  * `StartMapReduce(port, dataPath, appPath)` + the master's path queue,
  * `mpMaster/master.go:228-241`).
  *
  * A "job" is input paths + a Map UDF + a Reduce UDF; everything the
  * reference hand-rolled around that (chunking, scheduling, shipping
  * the UDF, heartbeats, retry — SURVEY §2 A11–A15) is Spark's problem.
  * Differences from the reference are deliberate semantic fixes
  * (SURVEY §1.4): line-aware splitting instead of byte-chunking that
  * loses the file tail (Q3), a constant partition count per job (Q5),
  * and a Reduce phase that actually runs (Q2).
  */
class Engine(val spark: SparkSession) {

  /** Text job: records are lines (the splitting the reference intended —
    * its fixed-size byte chunks cut words in half and drop the tail,
    * `mpMaster/master.go:148-157,73`). */
  def submit[K, V, R](dataPaths: Seq[String])(
      mapFn: String => IterableOnce[(K, V)])(
      reduceFn: (K, Iterator[V]) => R)(implicit
      kvEnc: Encoder[(K, V)], kEnc: Encoder[K],
      krEnc: Encoder[(K, R)]): Dataset[(K, R)] = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.textFile(dataPaths: _*)
    MapReduce.reduceByKey(MapReduce.mapFlat(lines)(mapFn))(reduceFn)
  }

  /** Whole-file bytes job: the reference's literal input model (one
    * `[]byte` per file, `mpMaster/master.go:82`) for binary formats the
    * Map UDF parses itself. Spark's binaryFile source distributes the
    * reads; use only when records genuinely span the whole file. */
  def submitBytes[K, V, R](dataPaths: Seq[String])(
      mapFn: Array[Byte] => IterableOnce[(K, V)])(
      reduceFn: (K, Iterator[V]) => R)(implicit
      kvEnc: Encoder[(K, V)], kEnc: Encoder[K],
      krEnc: Encoder[(K, R)]): Dataset[(K, R)] = {
    import spark.implicits._
    val blobs = spark.read.format("binaryFile").load(dataPaths: _*)
      .select("content").as[Array[Byte]]
    MapReduce.reduceByKey(MapReduce.mapFlat(blobs)(mapFn))(reduceFn)
  }

  /** Zero-extra-pass pipeline metrics (`Dataset.observe`): attach named
    * aggregate metrics to a dataset; they accumulate DURING whatever
    * action next runs — no second scan, no collect. The returned
    * [[org.apache.spark.sql.Observation]] yields the metric row after
    * the action. At 100 TB this is how a pipeline self-reports row
    * counts, null rates, and bounds without doubling its I/O. */
  def observed[T](ds: Dataset[T], name: String,
      metrics: org.apache.spark.sql.Column*)
      : (Dataset[T], org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "at least one metric column")
    val obs = org.apache.spark.sql.Observation(name)
    (ds.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}

object Engine {
  def apply(spark: SparkSession): Engine = new Engine(spark)
}
