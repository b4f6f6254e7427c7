package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Sources

/** Round-trip every sink through its matching source and compare to the
  * original rows (schema + values). */
class SourcesSpec extends SparkSpec {

  private lazy val nation = Sources.parquet(spark, s"$sf/nation.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("parquet round-trip, partitioned by region key, partition pruning survives") {
    val out = Files.createTempDirectory("graft_pq").toString
    Sources.writeParquet(nation, out, partitionBy = Seq("n_regionkey"))
    val back = Sources.parquet(spark, out)
      .select(nation.columns.map(col).toIndexedSeq: _*)
    assert(rows(back.withColumn("n_regionkey", col("n_regionkey").cast("long"))) ==
      rows(nation.withColumn("n_regionkey", col("n_regionkey").cast("long"))))
    // pruned read: only one directory partition scanned
    val pruned = Sources.parquet(spark, out).where(col("n_regionkey") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == nation.where(col("n_regionkey") === 0).count())
  }

  test("json-lines round-trip with explicit schema") {
    val out = Files.createTempDirectory("graft_js").toString
    Sources.writeJsonLines(nation, out)
    val back = Sources.jsonLines(spark, out, nation.schema)
      .select(nation.columns.map(col).toIndexedSeq: _*)
    assert(back.schema == nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("csv round-trip with explicit schema and header") {
    val out = Files.createTempDirectory("graft_csv").toString
    Sources.writeCsv(nation, out)
    val back = Sources.csv(spark, out, nation.schema)
      .select(nation.columns.map(col).toIndexedSeq: _*)
    assert(back.schema == nation.schema)
    assert(rows(back) == rows(nation))
  }

  test("orc round-trip, partitioned, with predicate pushdown in the scan") {
    val out = Files.createTempDirectory("graft_orc").toString
    Sources.writeOrc(nation, out, partitionBy = Seq("n_regionkey"))
    val back = Sources.orc(spark, out)
      .select(nation.columns.map(col).toIndexedSeq: _*)
    assert(rows(back.withColumn("n_regionkey", col("n_regionkey").cast("long"))) ==
      rows(nation.withColumn("n_regionkey", col("n_regionkey").cast("long"))))
    val pruned = Sources.orc(spark, out).where(col("n_regionkey") === 0)
    assert(pruned.count() == nation.where(col("n_regionkey") === 0).count())
  }

  test("xml file round-trip with explicit schema (Spark 4 native source)") {
    val out = Files.createTempDirectory("graft_xml").toString + "/nation"
    nation.write.format("xml").option("rootTag", "nations")
      .option("rowTag", "nation").save(out)
    val back = spark.read.format("xml").option("rowTag", "nation")
      .schema(nation.schema).load(out)
      .select(nation.columns.map(col).toIndexedSeq: _*)
    assert(rows(back) == rows(nation))
  }

  test("text + binary sources read the same bytes") {
    val dir = Files.createTempDirectory("graft_txt").toFile
    val f = new java.io.File(dir, "t.txt")
    Files.write(f.toPath, "alpha\nbeta\ngamma".getBytes)
    assert(Sources.text(spark, f.getPath).count() == 3)
    val blob = Sources.binary(spark, f.getPath)
      .select(col("content")).head().getAs[Array[Byte]](0)
    assert(new String(blob) == "alpha\nbeta\ngamma")
  }
}
