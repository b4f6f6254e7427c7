package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone repeat-measurement of Bench's streaming-throughput
  * metric, for separating real regressions from this host's CPU-steal
  * storms (the single in-Bench sample is as noisy as any other single
  * run — see SCALE.md's bench notes).
  *
  * usage: runMain graft.tools.StreamRate [n]
  */
object StreamRate {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rates = (1 to n).map { i =>
      val r = graft.Bench.streamThroughput(spark)
      println(f"[streamrate] run $i: $r%.0f rows/s")
      r
    }
    val sorted = rates.sorted
    println(f"[streamrate] median=${sorted(n / 2)}%.0f max=${sorted.last}%.0f rows/s")
    spark.stop()
  }
}
