package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence harness for the rolling-CDC constant-factor claim: times
  * the per-position substring chunker ([[graft.operators.Multimodal
  * .cdcChunksFast]], O(w) per byte) against the buzhash recurrence
  * ([[graft.operators.Multimodal.cdcChunksRolling]], O(1) per byte)
  * at several window widths over the same media table — the fast
  * path's cost grows with `w`, the rolling path's does not.
  *
  * usage: runMain graft.tools.ProfileCdcW [sfDir] [reps]
  */
object ProfileCdcW {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    def media = graft.operators.Multimodal.mediaTable(
      graft.queries.Q.t(spark, sfDir, "documents"))
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm-up (JIT + codegen)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cdcw] $label%-16s min=${ts.min}%.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    for (w <- Seq(4, 16, 32, 64)) {
      time(s"substr w=$w")(graft.operators.Multimodal.cdcChunksFast(
        media, w = w, modulus = 64, minLen = 16))
      time(s"rolling w=$w")(graft.operators.Multimodal.cdcChunksRolling(
        media, w = w, modulus = 64, minLen = 16))
    }
    spark.stop()
  }
}
