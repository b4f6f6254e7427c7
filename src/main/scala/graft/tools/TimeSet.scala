package graft.tools

import org.apache.spark.sql.SparkSession

/** Subset bench: times a LIST of inventory queries with the Bench
  * methodology (interleaved rounds, median + steal-immune min) in one
  * warm JVM — the before/after instrument for optimization work that
  * touches a handful of queries (full Bench is ~25 min; this is
  * minutes).
  *
  * usage: runMain graft.tools.TimeSet <q1> <q2> ... [--sf <dir>] [--n <rounds>]
  */
object TimeSet {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var rounds = 3
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" => sfDir = args(i + 1); i += 2
        case "--n" => rounds = args(i + 1).toInt; i += 2
        case q => names += q; i += 1
      }
    }
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
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val samples = scala.collection.mutable.LinkedHashMap(
      names.toSeq.map(n => n -> Vector.empty[Double]): _*)
    for (r <- 1 to rounds; name <- names) {
      spark.sparkContext.setJobDescription(s"timeset: $name r$r")
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case t: Throwable =>
        System.err.println(s"timeset: $name FAILED: ${t.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Caches.release()
      samples(name) = samples(name) :+ dt
      println(f"[timeset] r$r $name%-34s $dt%7.3f s")
    }
    println("[timeset] ---- summary ----")
    var medSum = 0.0; var minSum = 0.0
    for ((name, rs) <- samples) {
      val med = rs.sorted.apply(rs.length / 2)
      medSum += med; minSum += rs.min
      println(f"[timeset] $name%-34s median=$med%7.3f min=${rs.min}%7.3f runs=${rs.map(x => f"$x%.2f").mkString(",")}")
    }
    println(f"[timeset] TOTAL median=$medSum%.3f min=$minSum%.3f over ${names.size} queries")
    spark.stop()
  }
}
