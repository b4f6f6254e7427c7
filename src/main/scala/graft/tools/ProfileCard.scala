package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of the incremental dataset card: separates the two
  * appendToCardIndex folds (the ingest cost) from the cardFromIndex
  * assembly (the read cost), to attribute q_card_incremental's wall
  * time. usage: runMain graft.tools.ProfileCard [sfDir] [n]
  */
object ProfileCard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
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
    val path = java.nio.file.Files.createTempDirectory("graft_cardprof")
      .toString + "/card"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profilecard] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (i <- 1 to n) {
      time(s"run $i append b0")(
        graft.operators.TextAnalysis.appendToCardIndex(
          docs.where(col("doc_id") % 3 =!= 2), "doc_id", "text", "source",
          path, 0L))
      time(s"run $i append b1")(
        graft.operators.TextAnalysis.appendToCardIndex(
          docs.where(col("doc_id") % 3 === 2), "doc_id", "text", "source",
          path, 1L))
      time(s"run $i read")(
        graft.operators.TextAnalysis.cardFromIndex(spark, path).count())
      spark.catalog.clearCache()
      graft.operators.Caches.release()
    }
    spark.stop()
  }
}
