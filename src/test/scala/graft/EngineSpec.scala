package graft

import java.nio.file.Files

import graft.engine.Engine

/** End-to-end job submission: the word-count e2e the reference shipped
  * a manual harness for but could never complete (Reduce unimplemented,
  * SURVEY §1.4-Q2). Tokenizer semantics per §1.4-Q6: split on non-letter,
  * case-sensitive.
  */
class EngineSpec extends SparkSpec {

  test("Engine.submit: word count over text files, including the file tail") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_engine").toFile
    val f1 = new java.io.File(dir, "a.txt")
    val f2 = new java.io.File(dir, "b.txt")
    Files.write(f1.toPath, "the cat and the hat\nthe end".getBytes)
    Files.write(f2.toPath, "Cat cat CAT".getBytes)

    val result = Engine(spark)
      .submit[String, Int, Long](Seq(f1.getPath, f2.getPath)) { line =>
        line.split("[^\\p{L}]+").filter(_.nonEmpty).map(w => (w, 1))
      } { (_, vs) => vs.map(_.toLong).sum }
      .collect().toMap

    assert(result("the") == 3L)  // tail word "end" implies last line read
    assert(result("end") == 1L)
    assert(result("cat") == 2L)  // case-sensitive: cat != Cat != CAT
    assert(result("Cat") == 1L)
    assert(result("CAT") == 1L)
    assert(result.values.sum == 10L)
  }

  test("Engine.submitBytes: whole-file byte records") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_engine_b").toFile
    val f1 = new java.io.File(dir, "x.bin")
    val f2 = new java.io.File(dir, "y.bin")
    Files.write(f1.toPath, Array[Byte](1, 2, 3, 2))
    Files.write(f2.toPath, Array[Byte](2, 5))

    // count occurrences of each byte value across files
    val result = Engine(spark)
      .submitBytes[Int, Int, Long](Seq(f1.getPath, f2.getPath)) { bytes =>
        bytes.map(b => (b.toInt, 1))
      } { (_, vs) => vs.size.toLong }
      .collect().toMap

    assert(result == Map(1 -> 1L, 2 -> 3L, 3 -> 1L, 5 -> 1L))
  }

  test("observed: metrics accumulate during the action, no second scan") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", when(col("id") % 10 === 0, lit(null)).otherwise(col("id")))
    val (instrumented, obs) = Engine(spark).observed(df, "stats",
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      max(col("id")).as("max_id"))
    // the ONLY action is this count — metrics ride along with it
    assert(instrumented.count() === 1000L)
    val m = obs.get
    assert(m("n_rows") === 1000L)
    assert(m("n_null") === 100L)
    assert(m("max_id") === 999L)
  }
}
