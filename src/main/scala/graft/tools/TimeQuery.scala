package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-timing helper: runs a named inventory query N times in one
  * warm JVM and prints each wall time — the way to tell real cost from
  * this host's CPU-steal storms (identical runs vary 10x).
  *
  * usage: runMain graft.tools.TimeQuery <queryName> [sfDir] [n]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 5
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
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Caches.release()
      println(f"[timequery] run $i: $dt%.3f s")
      dt
    }
    println(f"[timequery] $name median=${times.sorted.apply(n / 2)}%.3f min=${times.min}%.3f max=${times.max}%.3f")
    spark.stop()
  }
}
