package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.MapReduce

/** Properties of the Map/Reduce contract the reference declares but
  * never finishes (SURVEY §1.4-Q1/Q2/Q5): value-permutation invariance,
  * partition-count invariance, map-emit conservation.
  */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  test("mapFlat emits 0..n pairs per record; emit count is conserved") {
    val ds = Seq("a b", "", "c d e").toDS()
    val pairs = MapReduce.mapFlat(ds)(s =>
      s.split(" ").iterator.filter(_.nonEmpty).map(w => (w, "1")))
    assert(pairs.count() === 5)
  }

  test("reduceByKey sees the full value list per key") {
    val pairs = Seq(("k1", "a"), ("k1", "b"), ("k2", "c")).toDS()
    val out = MapReduce.reduceByKey(pairs)((k, vs) => s"$k:${vs.toSeq.sorted.mkString(",")}")
      .collect().toMap
    assert(out === Map("k1" -> "k1:a,b", "k2" -> "k2:c"))
  }

  test("result invariant under partition count (fixes reference Q5)") {
    val base = (1 to 1000).map(i => (s"k${i % 7}", i.toString))
    val expected = base.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2.toInt).sum
    }
    for (parts <- Seq(1, 3, 16)) {
      val got = MapReduce.reduceByKey(
        spark.createDataset(base).repartition(parts))((_, vs) => vs.map(_.toInt).sum)
        .collect().toMap
      assert(got === expected, s"at $parts partitions")
    }
  }

  test("FoldAggregator == mapGroups fold for associative ops, any partitioning") {
    val sumFold = udaf(new MapReduce.FoldAggregator[Double, Double, Double](
      0.0, _ + _, _ + _, identity)(Encoders.scalaDouble, Encoders.scalaDouble))
    val df = (1 to 500).map(i => (s"g${i % 5}", i.toDouble)).toDF("k", "v")
    for (parts <- Seq(2, 9)) {
      val got = df.repartition(parts).groupBy("k").agg(sumFold(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exp = (1 to 500).groupBy(i => s"g${i % 5}").map { case (k, is) => k -> is.map(_.toDouble).sum }
      assert(got === exp)
    }
  }

  test("property (scalacheck): typed reduce fold invariant under value permutation") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000))) { xs =>
      val pairs = xs.map(x => ("k", x.toString))
      val shuffled = new scala.util.Random(42).shuffle(pairs)
      def run(ps: List[(String, String)]): Long =
        MapReduce.reduceByKey(spark.createDataset(ps).repartition(3))(
          (_, vs) => vs.map(_.toLong).sum).head()._2
      run(pairs) == run(shuffled)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
