package graft.tools

import org.apache.spark.sql.SparkSession

/** Print [[graft.operators.TextAnalysis.tokenizerFertility]] for a
  * testdata dir (vendored merges) — the measurement that feeds
  * q_fertility_mix's per-language fert_cpw config literals.
  * Usage: runMain graft.tools.ProfileFertility <sfDir>
  */
object ProfileFertility {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // predicted-language view (tokenizerFertility proper)
    graft.operators.TextAnalysis.tokenizerFertility(docs, "doc_id",
        "text", merges = graft.functions.Bpe.vendoredMerges)
      .collect().sortBy(_.getString(0)).foreach { r =>
        println(s"FERT pred=${r.getString(0)} cpw=${r.getLong(3)} " +
          s"docs=${r.getLong(1)} ws=${r.getLong(2)} ok=${r.getBoolean(4)}")
      }
    // stored-lang-column view (feeds q_fertility_mix's config literals)
    graft.functions.Bpe.tokenCountsBpeTagged(docs, "doc_id", "text",
        col("lang"), graft.functions.Bpe.vendoredMerges)
      .groupBy(col("tag")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("ws"),
        expr("(sum(bpe_tokens) * 100L) DIV sum(ws_tokens)").as("cpw"))
      .collect().sortBy(_.getString(0)).foreach { r =>
        println(s"FERT lang=${r.getString(0)} cpw=${r.getLong(3)} " +
          s"docs=${r.getLong(1)} ws=${r.getLong(2)}")
      }
    spark.stop()
  }
}
