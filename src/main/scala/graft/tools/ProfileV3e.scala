package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-expression timing of minhashDedupPairs on the v3 keeper set —
  * candidates are 14 rows over 67 KB of text, yet the operator costs
  * ~10 s there: this pins WHICH piece pays. Tooling only. */
object ProfileV3e {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    val docs = graft.queries.Q.t(spark, sfDir, "documents")
    docs.persist().count()
    val gDocs = docs.join(
      TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 25)
        .where(col("verdict")).select("doc_id"), Seq("doc_id"), "left_semi")
    val capped = gDocs.join(
      TextAnalysis.domainCap(gDocs, "doc_id", "source", cap = 10)
        .select("doc_id"), Seq("doc_id"), "left_semi").persist()
    val scrub = TextAnalysis.dedupExactSubstrings(capped, "doc_id", "text")
      .select(col("doc_id"), col("n_kept").as("n_tok"))
    val fin = TextAnalysis.temperatureMixDocs(
        capped.select(col("doc_id"), col("source")).join(scrub, Seq("doc_id")),
        budgetTokens = 2000L)
      .where(col("kept")).select("doc_id").persist()
    fin.count()
    val finDocs = docs.join(fin, Seq("doc_id"), "left_semi")
      .select("doc_id", "text").persist()
    finDocs.count()

    def t(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"PIECE $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows $n")
    }

    val sigs = Dedup.minhashSignaturesHashed(
      Dedup.gramHashes(finDocs, "doc_id", "text", 3), 64)
    t("sigs")(sigs.count())
    val candsRaw = Dedup.cappedBucketPairs(
      Dedup.lshBandBuckets(sigs, 16, 4), Seq("band", "bucket"),
      "doc_id", 64).toDF("doc_a", "doc_b")
    t("cands")(candsRaw.count())
    val cands = candsRaw.persist()
    cands.count()
    val listener = new org.apache.spark.scheduler.SparkListener {
      val t00 = System.nanoTime()
      def rel = f"${(System.nanoTime() - t00) / 1e9}%7.3f"
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"  [$rel] JOB ${js.jobId} start stages=${js.stageInfos.map(_.numTasks).mkString("+")}")
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(s"  [$rel] JOB ${je.jobId} end")
    }
    spark.sparkContext.addSparkListener(listener)
    t("rescore_persisted_cands")(
      Dedup.jaccardRescore(cands, finDocs, "doc_id", "text", 3)
        .where(col("jaccard") >= 0.8).count())
    spark.sparkContext.removeSparkListener(listener)
    t("full_operator")(
      Dedup.minhashDedupPairs(finDocs, "doc_id", "text", 3, 64, 16, 0.8)
        .count())
    println(s"finDocs partitions = ${finDocs.rdd.getNumPartitions}")
    val fd1 = finDocs.coalesce(1).persist(); fd1.count()
    t("full_operator_coalesced1")(
      Dedup.minhashDedupPairs(fd1, "doc_id", "text", 3, 64, 16, 0.8)
        .count())
    val fd4 = finDocs.repartition(4).persist(); fd4.count()
    t("full_operator_repart4")(
      Dedup.minhashDedupPairs(fd4, "doc_id", "text", 3, 64, 16, 0.8)
        .count())
    // lineage truncation at the pipeline boundary: the keeper set is
    // the stage-4 OUTPUT — cut the five-stage plan there so downstream
    // planning doesn't re-optimize the whole composition per AQE stage
    val fdT = finDocs.localCheckpoint()
    t("full_operator_truncated")(
      Dedup.minhashDedupPairs(fdT, "doc_id", "text", 3, 64, 16, 0.8)
        .count())
    val pT = Dedup.minhashDedupPairs(fdT, "doc_id", "text", 3, 64, 16, 0.8)
      .select("doc_a", "doc_b")
    t("split_truncated")(
      Dedup.leakageSafeSplit(fdT, pT, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).count())
    spark.stop()
  }
}
