package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.Q

/** Stage-by-stage timing of the MinHash-LSH dedup pipeline (perf
  * diagnosis only; not part of the query surface).
  *
  * usage: runMain graft.tools.ProfileMinhash [sfDir]
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // warmup
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    val docs = Q.t(spark, sfDir, "documents")
    time("scan")(docs.count())
    val gh = Dedup.gramHashes(docs, "doc_id", "text", 3)
    time("gramHashes")(gh.count())
    val sigs = Dedup.minhashSignaturesHashed(gh, 64)
    time("signatures")(sigs.count())
    val sigsP = sigs.persist()
    time("signatures-persist")(sigsP.count())
    val buckets = Dedup.lshBandBuckets(sigsP, 16, 4)
    time("buckets(from cached)")(buckets.count())
    val cands = Dedup.candidatePairs(buckets)
    time("candidates")(cands.count())
    val candsP = cands.persist()
    candsP.count()
    val candIds = candsP.select(col("doc_a").as("doc_id"))
      .union(candsP.select(col("doc_b").as("doc_id"))).distinct()
    val candGrams = Dedup.gramSets(
      docs.join(broadcast(candIds), Seq("doc_id"), "left_semi"),
      "doc_id", "text", 3)
    time("candGrams")(candGrams.count())
    time("jaccard+filter")(
      Dedup.jaccard(candsP, candGrams).where(col("jaccard") >= 0.8).count())
    time("end-to-end fresh")(
      Dedup.minhashDedupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
