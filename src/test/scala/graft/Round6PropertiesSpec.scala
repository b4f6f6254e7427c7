package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Graph, Multimodal, TextAnalysis}

/** Property-based invariants for the round-6 operators: randomized
  * inputs, structural guarantees that must hold for EVERY corpus —
  * the complement of the hand-computed fixtures in the per-operator
  * specs. Few scalacheck iterations (each runs Spark jobs), many
  * random rows per iteration.
  */
class Round6PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pageRankInt — rank floor, mass bound, partition invariance") {
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(1L, 30L)))
      .map(_.filter { case (a, b) => a != b }.distinct)
      .suchThat(_.nonEmpty)
    check(Prop.forAll(edgeGen) { es =>
      val edges = es.toDF("src", "dst")
      val ranks = Graph.pageRankInt(edges, iters = 2)
        .as[(Long, Long)].collect().toMap
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val base = 1000000L * 15 / 100
      // every node present, rank >= the teleport base, total mass never
      // exceeds what iteration 0 held (floor losses + dropped dangling
      // mass only shrink it; base+damped <= scale per node)
      ranks.keySet == nodes.toSet &&
        ranks.values.forall(_ >= base) &&
        ranks.values.sum <= nodes.size * 1000000L &&
        // repartitioned edges give bit-identical ranks
        Graph.pageRankInt(edges.repartition(7), iters = 2)
          .as[(Long, Long)].collect().toMap == ranks
    })
  }

  test("property: dedupExactSubstrings — global-min doc untouched, removal bounded, order-invariant") {
    // tiny word alphabet so 5-gram sharing actually happens
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val corpus = Gen.nonEmptyListOf(doc).map(_.take(6).zipWithIndex
      .map { case (t, i) => (i.toLong + 1, t) })
    check(Prop.forAll(corpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = TextAnalysis.dedupExactSubstrings(df, "doc_id", "text")
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      val minId = docs.map(_._1).min
      got(minId)._4 == 0 && // smallest id owns everything it has
        got.values.forall(r => r._4 >= 0 && r._4 <= r._2 &&
          r._2 == r._3 + r._4) &&
        // input row order cannot matter
        TextAnalysis.dedupExactSubstrings(
            docs.reverse.toDF("doc_id", "text"), "doc_id", "text")
          .as[(Long, Long, Long, Long, String)].collect()
          .map(r => r._1 -> r).toMap == got
    })
  }

  test("property: leakageSafeSplit — total function, pair-connected docs co-assigned") {
    val pairGen = Gen.listOfN(8,
      Gen.zip(Gen.chooseNum(1L, 20L), Gen.chooseNum(1L, 20L)))
      .map(_.filter { case (a, b) => a < b })
    check(Prop.forAll(pairGen) { ps =>
      val docs = (1L to 20L).toDF("doc_id")
      val pairs = ps.toDF("doc_a", "doc_b")
      val got = Dedup.leakageSafeSplit(docs, pairs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      got.keySet == (1L to 20L).toSet &&
        ps.forall { case (a, b) => got(a)._2 == got(b)._2 }
    })
  }

  test("property: temperatureMix — cuts bounded, targets sum within budget") {
    val srcGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(1, 12))).map(_.take(20))
    check(Prop.forAll(srcGen) { rows =>
      val docs = rows.zipWithIndex.map { case ((s, nw), i) =>
        (i.toLong, Seq.fill(nw)("word").mkString(" "), s)
      }.toDF("doc_id", "text", "source")
      val got = TextAnalysis.temperatureMix(docs, "doc_id", "text",
        "source", budgetTokens = 30L).collect()
      got.forall { r =>
        r.getLong(5) >= 0L && r.getLong(5) <= 65536L &&
          r.getLong(6) <= r.getLong(1) // kept <= docs
      } && got.map(_.getLong(4)).sum <= 30L // targets never exceed budget
    })
  }

  test("property: temperatureMixDocs — per-source rollup of the doc decisions IS temperatureMix") {
    val srcGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.chooseNum(1, 12))).map(_.take(20))
    check(Prop.forAll(srcGen) { rows =>
      val docs = rows.zipWithIndex.map { case ((s, nw), i) =>
        (i.toLong, Seq.fill(nw)("word").mkString(" "), s)
      }.toDF("doc_id", "text", "source")
      val counts = docs.select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.letterTokens(col("text")))
          .cast("long").as("n_tok"))
      val rolled = TextAnalysis.temperatureMixDocs(counts, budgetTokens = 30L)
        .groupBy("source")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val mix = TextAnalysis.temperatureMix(docs, "doc_id", "text",
          "source", budgetTokens = 30L)
        .select("source", "n_kept")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rolled == mix
    })
  }

  test("property: imageAHash — constant image hashes to zero, any image round-trips the codec") {
    val seedGen = Gen.chooseNum(0, 255)
    check(Prop.forAll(seedGen) { v =>
      val img = new java.awt.image.BufferedImage(12, 9,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 9; x <- 0 until 12)
        img.getRaster.setSample(x, y, 0, v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val row = Multimodal.imageAHash(
        Seq(Multimodal.MediaRow(1L, "image", bos.toByteArray)).toDS())
        .collect().head
      // equal pixels: px*64 > total is strict -> no bit set
      row.phash == 0L && row.width == 12 && row.height == 9
    })
  }

  test("property: frameContainmentPairs — ordered pairs, bounded containment, partition invariance, maxDf monotonicity") {
    // tiny frame-hash alphabet so sharing actually happens; rows
    // distinct, the videoFrameFingerprints contract
    val rowGen = Gen.zip(Gen.chooseNum(1L, 12L),
      Gen.oneOf("fa", "fb", "fc", "fd", "fe", "ff"))
    val tabGen = Gen.nonEmptyListOf(rowGen).map(_.distinct)
    check(Prop.forAll(tabGen) { rows =>
      val df = rows.toDF("doc_id", "fh")
      def run(d: org.apache.spark.sql.DataFrame, maxDf: Int = 50) =
        Multimodal.frameContainmentPairs(d, minShared = 1,
            thresholdPpm = 300000L, maxDf = maxDf)
          .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val got = run(df)
      val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val gotIds = got.map(g => (g._1, g._2)).toSet
      got.forall { case (a, b, ns, ppm) =>
        // ordered, shared count bounded by the smaller frame set,
        // containment a valid ppm of it
        a < b && ns >= 1 && ns <= math.min(sizes(a), sizes(b)) &&
          ppm > 0 && ppm <= 1000000L &&
          ppm == ns * 1000000L / math.min(sizes(a), sizes(b)) } &&
        // physical layout cannot matter
        run(df.repartition(5)) == got &&
        // a stricter boilerplate guard only removes pairs (sizes come
        // from the FULL table, so shared counts only shrink)
        run(df, maxDf = 2).forall(p => gotIds.contains((p._1, p._2)))
    })
  }
}
