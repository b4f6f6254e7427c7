package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Stage-by-stage wall-clock decomposition of `q_corpus_pipeline_v3`
  * (the round-7 bench ceiling): times each of the five composed stages
  * in isolation — each stage's inputs forced and persisted first, so a
  * stage's number is ITS work, not its upstream's — to answer whether
  * the pipeline's cost has one trimmable hotspot or is an irreducible
  * stage floor. Tooling only (feeds SCALE.md), not part of the library
  * surface.
  *
  * usage: runMain graft.tools.ProfileV3 <sfDir> [reps]
  */
object ProfileV3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()

    val docs = graft.queries.Q.t(spark, sfDir, "documents")
    docs.persist().count()

    def timeIt(name: String)(body: => Long): Unit = {
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }.drop(1) // first run untimed (codegen)
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"STAGE $name%-28s median ${med}%6.2f s  min ${times.map(_._1).min}%6.2f s  rows ${times.head._2}")
    }

    // stage 1: Gopher rules + keep-join
    val gDocs = docs.join(
      TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 25)
        .where(col("verdict")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    timeIt("gopher")(gDocs.count())
    val g = gDocs.persist(); g.count()

    // stage 2: domain cap
    val capped = g.join(
      TextAnalysis.domainCap(g, "doc_id", "source", cap = 10)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    timeIt("domain_cap")(capped.count())
    val c = capped.persist(); c.count()

    // stage 3: exact-substring scrub WITHIN the capped set
    val scrub = TextAnalysis.dedupExactSubstrings(c, "doc_id", "text")
      .select(col("doc_id"), col("n_kept").as("n_tok"))
    timeIt("substring_scrub")(scrub.count())
    val s3 = scrub.persist(); s3.count()

    // stage 4: temperature mix on scrubbed counts
    val counts = c.select(col("doc_id"), col("source")).join(s3, Seq("doc_id"))
    val fin = TextAnalysis.temperatureMixDocs(counts, budgetTokens = 2000L)
      .where(col("kept"))
      .select(col("doc_id"), col("source"), col("n_tok").as("n_tok_scrubbed"))
    timeIt("temperature_mix")(fin.count())
    val f = fin.persist(); f.count()

    // stage 5a: minhash pairs over the final keepers
    val finDocs = docs.join(f.select("doc_id"), Seq("doc_id"), "left_semi")
    val fd = finDocs.persist(); fd.count()
    def pairs = Dedup.minhashDedupPairs(fd, "doc_id", "text",
      ngram = 3, numHashes = 64, bands = 16, threshold = 0.8)
    timeIt("minhash_pairs")(pairs.count())
    val p = pairs.select(col("doc_a"), col("doc_b")).persist(); p.count()

    // stage 5b: leakage-safe split (pointer-jumping closure + cut rule)
    timeIt("leakage_split")(
      Dedup.leakageSafeSplit(fd, p, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).count())

    spark.stop()
  }
}
