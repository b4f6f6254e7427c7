package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-ratio harness: time a SUBSET of the query inventory against
  * an arbitrary data dir (e.g. a 10× replica corpus built by
  * `tools/make_scale_corpus.py`) in one JVM. One untimed warm-up run
  * per query (JIT, codegen, and — for the incremental family — the
  * content-addressed index build, which is the offline ingest step,
  * not the query), then `reps` timed repetitions INTERLEAVED across
  * queries (whole-suite rounds, same steal-storm defense as Bench);
  * reports median and min per query as one JSON line.
  *
  * usage: runMain graft.tools.ScaleRun <sfDir> <q1,q2,...> [reps]
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
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

    // action "count" (default; matches Bench) vs "consume": count()
    // lets Catalyst prune subtrees that don't change row counts (e.g.
    // a left join onto an aggregate — exactly memorizationRisk's
    // shape), so annotation-style operators need the consuming action
    // (hash-sum over every output column) for an honest cost.
    val consume = args.length > 3 && args(3) == "consume"
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (consume)
        df.select(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.xxhash64(
            df.columns.map(org.apache.spark.sql.functions.col)
              .toIndexedSeq: _*))).collect()
      else df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Caches.release()
      dt
    }
    names.foreach(once) // warm-up round, untimed
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map(_ -> Vector.empty[Double]): _*)
    for (_ <- 1 to reps; n <- names)
      samples(n) = samples(n) :+ once(n)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val body = samples.map { case (n, rs) =>
      f""""$n":{"median":${med(rs)}%.3f,"min":${rs.min}%.3f}"""
    }.mkString(",")
    println(s"""{"sfDir":"$sfDir","reps":$reps,$body}""")
    spark.stop()
  }
}
