package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for the streaming ingest-dedup loop: times each
  * phase of each batch step. usage: runMain graft.tools.ProfileIngest [sfDir] */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.queries.Q.t(spark, sfDir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft-profile-").toString
    for (bid <- 0L to 2L) {
      t(s"batch $bid TOTAL") {
        graft.operators.Dedup.ingestDedupBatch(
          docs.where(col("doc_id") % 3 === bid), bid,
          s"$tmp/bandidx", s"$tmp/admitted")
      }
    }
    // second pass: fresh dirs, phase-level timing via a manual replica
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-profile2-").toString
    import graft.operators.{Caches, Dedup}
    for (bid <- 0L to 2L) {
      val b = Caches.persist(docs.where(col("doc_id") % 3 === bid)
        .select(col("doc_id"), col("text")))
      t(s"b$bid isEmpty")(b.isEmpty)
      val first = !graft.io.IndexPaths.complete(spark, s"$tmp2/bandidx")
      val bBuckets = Caches.persist(Dedup.docBandBuckets(b, "doc_id", "text"))
      t(s"b$bid buckets materialize")(bBuckets.count())
      val pairs =
        if (first) {
          val cands = Caches.persist(Dedup.candidatePairs(bBuckets)
            .toDF("doc_a", "doc_b"))
          Dedup.jaccardRescore(cands, b, "doc_id", "text", 3)
            .where(col("jaccard") >= 0.8)
        } else
          Dedup.incrementalDedupPairsFromBuckets(bBuckets, b,
            spark.read.parquet(s"$tmp2/admitted")
              .select(col("doc_id"), col("text")),
            s"$tmp2/bandidx", "doc_id", "text")
      val p = t(s"b$bid pairs materialize")(
        Caches.persist(pairs.select(col("doc_a"), col("doc_b"))))
      t(s"b$bid pairs count")(p.count())
      val ids = b.select(col("doc_id").as("__id"))
      def inBatch(c: String) = ids.withColumnRenamed("__id", c)
      val bothNew = p.join(inBatch("doc_a"), Seq("doc_a"), "left_semi")
        .join(inBatch("doc_b"), Seq("doc_b"), "left_semi")
        .select(col("doc_b").as("__rej"))
      val corpusOnA = p.join(inBatch("doc_a"), Seq("doc_a"), "left_anti")
        .select(col("doc_b").as("__rej"))
      val corpusOnB = p.join(inBatch("doc_b"), Seq("doc_b"), "left_anti")
        .select(col("doc_a").as("__rej"))
      val rejected = bothNew.unionByName(corpusOnA).unionByName(corpusOnB)
        .distinct()
      val admitted = Caches.persist(
        b.join(rejected, col("doc_id") === col("__rej"), "left_anti"))
      t(s"b$bid admitted count")(admitted.count())
      t(s"b$bid admitted write")(admitted.write.mode("overwrite")
        .parquet(s"$tmp2/admitted/batch=$bid"))
      val admittedBuckets = bBuckets.join(
        admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
      if (first)
        t(s"b$bid index fold (write)")(
          Dedup.writeBandIndexFromBuckets(admittedBuckets, s"$tmp2/bandidx",
            coalesceTo = 8))
      else {
        val nb = t(s"b$bid fold: admittedBuckets persist")(
          admittedBuckets.persist())
        t(s"b$bid fold: nb count")(nb.count())
        val touched = nb.select(col("band"), col("bucket")).distinct()
        val base = spark.read.parquet(s"$tmp2/bandidx")
          .join(broadcast(touched), Seq("band", "bucket"), "left_semi")
          .groupBy(col("band"), col("bucket"))
          .agg(max(col("__r")).as("__base"))
        val baseC = t(s"b$bid fold: base persist+count") {
          val c = base.persist(); c.count(); c
        }
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("band"), col("bucket"))
          .orderBy(col("doc_id").asc)
        t(s"b$bid fold: rank+join+append write")(
          nb.withColumn("__nr", row_number().over(w))
            .join(baseC, Seq("band", "bucket"), "left")
            .select(col("doc_id"), col("band"), col("bucket"),
              (col("__nr") + coalesce(col("__base"), lit(0))).as("__r"))
            .coalesce(8)
            .write.mode("append").parquet(s"$tmp2/bandidx"))
        nb.unpersist(); baseC.unpersist()
      }
      Caches.release()
    }
    spark.stop()
  }
}
