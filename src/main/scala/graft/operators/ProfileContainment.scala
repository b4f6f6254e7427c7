package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for [[Dedup.incrementalContainmentPairs]]
  * (lives in the operators package to reach the private stages).
  * usage: runMain graft.operators.ProfileContainment [sfDir] [n] */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 2
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
    val corpus = docs.where(col("doc_id") % 5 =!= 4)
    val fresh = docs.where(col("doc_id") % 5 === 4)
    val indexPath = graft.io.IndexPaths.indexPath("contidx",
      s"$sfDir/documents.parquet", "n3")
    t("ensure index")(
      Dedup.ensureContainmentIndex(corpus, "doc_id", "text", indexPath))
    val threshold = 0.8
    for (i <- 1 to n) {
      println(s"=== run $i ===")
      val bsets = Caches.persist(
        Dedup.gramSetArrays(fresh, "doc_id", "text", 3))
      t("bsets count")(bsets.count())
      val postings = spark.read.parquet(indexPath)
      val idxDf = postings.select(col("gh"), col("__df")).distinct()
      t("idxDf distinct count")(idxDf.count())
      val bGramsAll = bsets.select(col("doc_id"), explode(col("__hs")).as("gh"))
      val bIMin = Dedup.iMinOf(col("__sz"), threshold)
      val bPrefix = bGramsAll.join(idxDf.hint("shuffle_hash"), Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("__df"), col("gh")))).as("__ord"))
        .join(bsets.select(col("doc_id"), col("__sz")).hint("shuffle_hash"),
          Seq("doc_id"))
        .select(col("doc_id"), explode(slice(col("__ord"), lit(1),
          greatest((size(col("__ord")) - bIMin + 1).cast("int"), lit(0)))).as("__p"))
        .select(col("doc_id"), col("__p.gh").as("gh"))
      val bPrefixP = Caches.persist(bPrefix)
      t("bPrefix count")(bPrefixP.count())
      val vsCorpus = bPrefixP.select(col("doc_id").as("n_id"), col("gh"))
        .join(postings.select(col("gh"), col("doc_id").as("c_id")), Seq("gh"))
        .select(col("n_id"), col("c_id"))
      t("vsCorpus count")(vsCorpus.count())
      val cPrefix = postings.where(
        col("__r") <= col("__sz") - Dedup.iMinOf(col("__sz"), threshold) + 1)
      val bGrams = bsets.select(col("doc_id").as("n_id"), explode(col("__hs")).as("gh"))
      val vsNew = cPrefix.select(col("gh"), col("doc_id").as("c_id"))
        .join(bGrams, Seq("gh"))
        .select(col("n_id"), col("c_id"))
      t("vsNew count")(vsNew.count())
      val vsSelf = Dedup.prefixCandidates(bsets, threshold, None)
      t("vsSelf count")(vsSelf.count())
      val cands = Caches.persist(vsCorpus.unionByName(vsNew)
        .select(least(col("n_id"), col("c_id")).as("doc_a"),
          greatest(col("n_id"), col("c_id")).as("doc_b"))
        .unionByName(vsSelf)
        .distinct())
      t("cands count")(cands.count())
      val candIds = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id")))
      val hsets = bsets.select(col("doc_id"), col("__hs"), col("__sz").as("__sz2"))
        .unionByName(spark.read.parquet(indexPath + ".gsets")
          .join(candIds.distinct(), Seq("doc_id"), "left_semi"))
      t("hsets count")(hsets.count())
      val docsAll = fresh.select(col("doc_id"), col("text"))
        .unionByName(corpus.select(col("doc_id"), col("text")))
      val out = Dedup.scoreContainment(cands, hsets, docsAll,
        "doc_id", "text", 3, threshold)
      t("scoreContainment count")(out.count())

      // decomposed scoreContainment
      val mem = cands.select(col("doc_a"), col("doc_b"),
          col("doc_a").as("doc_id"), lit(true).as("__is_a"))
        .unionByName(cands.select(col("doc_a"), col("doc_b"),
          col("doc_b").as("doc_id"), lit(false).as("__is_a")))
      val prepass = hsets.join(mem, "doc_id")
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(
          first(when(col("__is_a"), col("__hs")), ignoreNulls = true).as("__ha"),
          first(when(!col("__is_a"), col("__hs")), ignoreNulls = true).as("__hb"),
          first(when(col("__is_a"), col("__sz2")), ignoreNulls = true).as("__sza"),
          first(when(!col("__is_a"), col("__sz2")), ignoreNulls = true).as("__szb"))
        .withColumn("__hi", size(array_intersect(col("__ha"), col("__hb"))))
        .where(greatest(
            col("__hi").cast("double") / col("__sza").cast("double"),
            col("__hi").cast("double") / col("__szb").cast("double"))
          >= threshold)
        .select(col("doc_a"), col("doc_b"))
      val passed = Caches.persist(prepass)
      t("  prepass count")(passed.count())
      t("  verify (pairGramSets) count")(
        Dedup.pairGramSets(passed, docsAll, "doc_id", "text", 3).count())
      Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
