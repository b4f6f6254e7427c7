package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: prints the formatted physical plan (and
  * optionally runs) a named query from the inventory.
  *
  * usage: runMain graft.tools.Explain <queryName> [sfDir] [run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doRun = args.contains("run")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (doRun) {
      val t0 = System.nanoTime()
      println(s"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      println(s"rows=${df.count()} warm in ${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
