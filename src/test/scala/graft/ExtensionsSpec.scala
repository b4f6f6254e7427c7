package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension-registered SQL functions must work from SQL text and
  * agree with the Column-API forms. Uses its own session (extensions
  * bind at session build). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate reuses the JVM-wide default session (TestSpark's) and
    // would silently skip the extensions: clear the default so a fresh
    // session (sharing the same SparkContext) is built WITH them, then
    // restore the shared one as default for the other suites.
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("dot_q / dot_d callable from SQL and correct") {
    val r = spark.sql(
      """SELECT dot_q(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |             array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS q,
        |       dot_d(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |             array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
        |""".stripMargin).head()
    // floor(1.5*1000)*floor(2*1000) + floor(-2*1000)*floor(0.5*1000)
    assert(r.getLong(0) == 1500L * 2000L + -2000L * 500L)
    assert(math.abs(r.getDouble(1) - (1.5 * 2.0 + -2.0 * 0.5)) < 1e-12)
  }

  test("top_k_by_score callable from SQL: bounded top-k aggregate") {
    val r = spark.sql(
      """SELECT g, top_k_by_score(s, i, 2) AS top FROM VALUES
        |  (1, 5.0D, 10L), (1, 7.0D, 11L), (1, 5.0D, 9L), (2, 1.0D, 20L)
        |  AS t(g, s, i)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = r(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(x => (x.getDouble(0), x.getLong(1))) == Seq((7.0, 11L), (5.0, 9L)))
    val g2 = r(1).getSeq[org.apache.spark.sql.Row](1)
    assert(g2.map(x => (x.getDouble(0), x.getLong(1))) == Seq((1.0, 20L)))
  }

  test("minhash_sig / simhash_agg callable from SQL, agree with Column-API forms") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataset(Seq((1L, "the cat"), (1L, "cat sat"), (2L, "dog")))(
      org.apache.spark.sql.Encoders.product[(Long, String)])
      .toDF("doc_id", "g")
    df.createOrReplaceTempView("grams_v")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(g, 8) AS sig FROM grams_v GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = graft.operators.Dedup.minhashSignaturesAgg(df, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
    val sh = spark.sql(
      "SELECT doc_id, simhash_agg(g) AS h FROM grams_v GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.size == 2 && sh(1L) != 0L)
  }

  test("ensureRegistered: natives become SQL-callable on a live extensionless session") {
    val s = TestSpark.spark // built WITHOUT the extensions
    graft.plans.GraftExtensions.ensureRegistered(s)
    val r = s.sql(
      """SELECT dot_q(array(CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT))) AS q"""
    ).head()
    assert(r.getLong(0) == 2000L * 3000L)
  }

  test("installSqlMacros: quality/tokens/grams/chunk-bounds usable from pure SQL") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    graft.plans.GraftExtensions.installSqlMacros(s)
    // tokens + quality agree with the Scala operators
    val docs = s.createDataFrame(Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "x1 2! 3?"),
      (3L, "one two three four five six seven")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs_macros_v")
    val viaSql = s.sql(
      """SELECT doc_id, size(graft_tokens(text)) AS n_toks,
        |  graft_quality_keep(text) AS keep,
        |  size(graft_grams(text, 3)) AS n_grams
        |FROM docs_macros_v""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getInt(3)))).toMap
    val quality = graft.operators.TextAnalysis.quality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getAs[String]("verdict") == "keep")).toMap
    assert(viaSql(1L)._2 == quality(1L) && viaSql(2L)._2 == quality(2L) &&
      viaSql(3L)._2 == quality(3L))
    assert(viaSql(1L)._1 == 10 && viaSql(2L)._1 == 1)
    // distinct 3-gram count matches gramSets
    val gs = graft.operators.Dedup.gramSets(docs, "doc_id", "text", 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql(1L)._3.toLong == gs(1L) && viaSql(3L)._3.toLong == gs(3L))
    // chunk bounds as a LATERAL table function — same arithmetic as chunkDocs
    val bounds = s.sql(
      """SELECT doc_id, chunk_idx, start_tok, n_tok
        |FROM (SELECT doc_id, CAST(size(graft_tokens(text)) AS BIGINT) AS n
        |      FROM docs_macros_v),
        |  LATERAL graft_chunk_bounds(n, 4, 3)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = graft.operators.TextAnalysis.chunkDocs(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bounds.sorted.toSeq == expect.sorted.toSeq)
  }

  test("graft_grams tokenizes ONCE per doc; graft_grams_arr form agrees") {
    val s = TestSpark.spark
    graft.plans.GraftExtensions.installSqlMacros(s)
    val docs = s.createDataFrame(Seq(
      (1L, "one two three four five six"), (2L, "a b"), (3L, "")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs_grams_once_v")
    // macro inlining substitutes arguments textually; the form must
    // bind the token array once (the one-element transform
    // let-binding), never re-run split+filter per gram position.
    // Plan check runs over the parquet table: a LocalRelation would be
    // constant-folded away, leaving no expressions to count.
    s.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .createOrReplaceTempView("docs_grams_plan_v")
    val p = s.sql("SELECT graft_grams(text, 3) AS gs FROM docs_grams_plan_v")
      .queryExecution.optimizedPlan.toString
    val nSplit = "split\\(".r.findAllIn(p).length
    assert(nSplit == 1,
      s"tokenization must appear exactly once in the plan, found $nSplit:\n$p")
    // array form == string form on the same docs
    val viaArr = s.sql(
      """SELECT doc_id, graft_grams_arr(graft_tokens(text), 3) AS gs
        |FROM docs_grams_once_v""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaStr = s.sql(
      "SELECT doc_id, graft_grams(text, 3) AS gs FROM docs_grams_once_v")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaArr == viaStr)
    assert(viaStr(1L).size == 4 && viaStr(2L).isEmpty && viaStr(3L).isEmpty)
  }

  test("graft_model_score macro == scoreHashedLinear, from pure SQL") {
    val s = TestSpark.spark
    graft.plans.GraftExtensions.installSqlMacros(s)
    val docs = s.createDataFrame(Seq(
      (1L, "hello world hello"), (2L, "spark scala spark streams")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("docs_model_v")
    val viaSql = s.sql(
      "SELECT doc_id, graft_model_score(text) AS sq FROM docs_model_v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScala = graft.operators.TextAnalysis
      .scoreHashedLinear(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_q")).toMap
    assert(viaSql == viaScala)
  }

  test("graft_shared_grams macro == decontaminate, from pure SQL") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    graft.plans.GraftExtensions.installSqlMacros(s)
    val docs = s.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val train = docs.where(col("doc_id") % 10 =!= 0)
    val eval = docs.where(col("doc_id") % 10 === 0)
    train.createOrReplaceTempView("decon_train_v")
    eval.createOrReplaceTempView("decon_eval_v")
    // (no WITH here: a CTE referenced from a scalar subquery inside an
    // inlined SQL UDF trips InlineCTE in Spark 4.1 — key not found)
    val viaSql = s.sql(
      """SELECT doc_id, n_shared_grams FROM (
        |  SELECT doc_id, graft_shared_grams(text,
        |    (SELECT array_distinct(flatten(collect_list(graft_grams(text, 5))))
        |     FROM decon_eval_v), 5) AS n_shared_grams
        |  FROM decon_train_v)
        |WHERE n_shared_grams > 0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val viaScala = graft.operators.TextAnalysis
      .decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared_grams")).toMap
    assert(viaSql == viaScala)
  }

  test("graft_rate_ppm / graft_rate_diff_ppm macros == termDrift, from pure SQL") {
    import org.apache.spark.sql.functions._
    val s = TestSpark.spark
    graft.plans.GraftExtensions.installSqlMacros(s)
    val docs = s.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    a.createOrReplaceTempView("drift_a_v")
    b.createOrReplaceTempView("drift_b_v")
    val viaSql = s.sql(
      """WITH ca AS (
        |  SELECT term, COUNT(*) AS c_a
        |  FROM (SELECT graft_tokens(text) AS ws FROM drift_a_v)
        |  LATERAL VIEW explode(ws) t AS term
        |  GROUP BY term),
        |cb AS (
        |  SELECT term, COUNT(*) AS c_b
        |  FROM (SELECT graft_tokens(text) AS ws FROM drift_b_v)
        |  LATERAL VIEW explode(ws) t AS term
        |  GROUP BY term),
        |j AS (
        |  SELECT coalesce(ca.term, cb.term) AS term,
        |    coalesce(c_a, 0L) AS c_a, coalesce(c_b, 0L) AS c_b
        |  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
        |na AS (SELECT sum(c_a) AS n_a FROM ca),
        |nb AS (SELECT sum(c_b) AS n_b FROM cb)
        |SELECT term, c_a, c_b,
        |  graft_rate_ppm(c_a, n_a) AS rate_a_ppm,
        |  graft_rate_ppm(c_b, n_b) AS rate_b_ppm,
        |  graft_rate_diff_ppm(c_a, n_a, c_b, n_b) AS rate_diff_ppm
        |FROM j CROSS JOIN na CROSS JOIN nb
        |WHERE c_a >= 5 OR c_b >= 5""".stripMargin)
      .collect().map(_.toString).sorted
    val viaScala = graft.operators.TextAnalysis
      .termDrift(a, b, "text", minCount = 5L)
      .collect().map(_.toString).sorted
    assert(viaSql.toSeq == viaScala.toSeq)
  }

  test("null semantics: null array or null element yields null") {
    val r = spark.sql(
      """SELECT dot_q(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT))) AS a,
        |       dot_q(array(CAST(NULL AS FLOAT)), array(CAST(1 AS FLOAT))) AS b
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
