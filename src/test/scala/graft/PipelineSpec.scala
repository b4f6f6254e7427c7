package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextAnalysis}

/** Training-pipeline assembly ops: sequence packing and deterministic
  * split assignment. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: concat-and-chunk bins by first-token position") {
    // shard 0: doc 0 (3 toks), doc 1 (4 toks), doc 2 (2 toks); budget 5
    val docs = Seq((0L, "a b c"), (1L, "d e f g"), (2L, "h i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        budget = 5, docsPerShard = 100)
      .select("doc_id", "shard", "n_tokens", "start_tok", "bin")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 0L, 3L, 0L, 0L), // starts at token 0 -> bin 0
      (1L, 0L, 4L, 3L, 0L), // starts at 3, straddles into bin 1
      (2L, 0L, 2L, 7L, 1L))) // starts at 7 -> bin 1
  }

  test("packSequences: shards pack independently") {
    val docs = Seq((0L, "a b c"), (1L, "d e"), (100L, "x y z w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text",
        budget = 4, docsPerShard = 100)
      .select("doc_id", "shard", "start_tok", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 100 opens shard 1 at token 0 regardless of shard 0's fill
    assert(got.toSeq === Seq((0L, 0L, 0L, 0L), (1L, 0L, 3L, 0L),
      (100L, 1L, 0L, 0L)))
  }

  test("chunkDocs: overlapping windows, short tail, sub-chunk doc") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 11).map(i => "w" * i).mkString(" ")), // 11 letter tokens
      (2L, "a b c"),                                   // shorter than chunk
      (3L, "")).toDF("doc_id", "text")                 // empty: no chunks
    val got = TextAnalysis.chunkDocs(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // doc 1: full windows at 0,3,6; short tail at 9 covers tokens 10-11
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 2L)))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 3L)))
    assert(!got.exists(_._1 == 3L))
    // overlap: chunk i starts stride into chunk i-1; content hash of a
    // known window matches a direct computation
    val h = TextAnalysis.chunkDocs(docs.where(col("doc_id") === 1L),
        "doc_id", "text", 4, 3)
      .where(col("chunk_idx") === 1L).select("chunk_md5").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(Seq("w" * 4, "w" * 5, "w" * 6, "w" * 7).mkString(" ")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h === want)
  }

  test("splitAssign: partitions are exhaustive, disjoint, and reproducible") {
    val df = spark.range(0, 5000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Relational.splitAssign(df, col("id"), splits)
    val counts = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 5000L)
    // md5 is uniform: each split lands within 20% of its expectation
    assert(math.abs(counts("train") - 4000L) < 800,
      s"train=${counts("train")}")
    assert(counts("val") > 250 && counts("test") > 250)
    // reproducible: a second run assigns identically
    val again = Relational.splitAssign(df, col("id"), splits)
    assert(got.select("id", "split").except(again.select("id", "split"))
      .count() === 0L)
    // consistent with the sampler: split 'train' == deterministicSample(0.8)
    val sampled = Relational.deterministicSample(df, col("id"), 0.8)
      .select("id").as[Long].collect().toSet
    val trainIds = got.where(col("split") === "train")
      .select("id").as[Long].collect().toSet
    assert(trainIds === sampled)
  }

  test("splitAssign rejects fractions that do not sum to 1") {
    val df = spark.range(0, 10).toDF("id")
    intercept[IllegalArgumentException] {
      Relational.splitAssign(df, col("id"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  private def shardDocs = (0L until 40L)
    .map(i => (i, s"alpha beta tok$i gamma")).toDF("doc_id", "text")

  test("trainingShards: epoch-stable membership, per-epoch permutation") {
    def layout(epoch: Long) = TextAnalysis.trainingShards(shardDocs,
        "doc_id", "text", nShards = 4, epoch = epoch)
      .as[(Long, Long, Long, Long)].collect()
    val e0 = layout(0L)
    val e1 = layout(1L)
    // membership never moves between epochs
    assert(e0.map(r => (r._1, r._2)).toSet === e1.map(r => (r._1, r._2)).toSet)
    // pos is a contiguous 1..n sequence within every shard, both epochs
    for (e <- Seq(e0, e1); (_, rows) <- e.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    // advancing the epoch re-permutes at least one shard's read order
    def orders(e: Array[(Long, Long, Long, Long)]) =
      e.groupBy(_._2).map { case (s, r) => s -> r.sortBy(_._3).map(_._1).toSeq }
    val (o0, o1) = (orders(e0), orders(e1))
    assert(o0.keys.exists(s => o0(s) != o1(s)))
    // every token count is the letter-token count of the doc
    assert(e0.forall(_._4 === 4L))
    // fully deterministic: a re-run reproduces the layout bit-for-bit
    assert(layout(0L).sortBy(r => (r._2, r._3)).toSeq ===
      e0.sortBy(r => (r._2, r._3)).toSeq)
  }

  test("writeTrainingShards: one ordered file per shard dir + manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards")
      .toString
    TextAnalysis.writeTrainingShards(shardDocs, "doc_id", "text", dir,
      nShards = 4, epoch = 1L)
    val want = TextAnalysis.trainingShards(shardDocs, "doc_id", "text",
      nShards = 4, epoch = 1L)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    for (sd <- shardDirs) {
      val k = sd.getName.stripPrefix("shard=").toLong
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      // the whole shard landed in one task -> exactly one data file
      assert(files.length === 1, s"shard $k files: ${files.length}")
      // file row order IS the epoch permutation (loaders stream as-is)
      val got = spark.read.parquet(files.head.toString)
        .select("doc_id").as[Long].collect().toSeq
      val expect = want.where(col("shard") === k).orderBy(col("pos"))
        .select("doc_id").as[Long].collect().toSeq
      assert(got === expect, s"shard $k order")
    }
    // a table read of the layout sees every doc once and NOT _manifest
    val all = spark.read.parquet(dir)
    assert(all.count() === 40L)
    assert(all.columns.toSet === Set("doc_id", "text", "n_tokens", "shard"))
    // the manifest matches a recompute from the logical layout
    val man = spark.read.parquet(s"$dir/_manifest")
      .select("shard", "n_docs", "n_tokens", "id_checksum")
    val recomputed = TextAnalysis.shardManifest(want)
      .select("shard", "n_docs", "n_tokens", "id_checksum")
    assert(man.except(recomputed).count() === 0L &&
      recomputed.except(man).count() === 0L)
  }

  test("datasetCard: hand-computed rates; dup is corpus-wide; top lang matches langId rollup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "A"), // keep (letters dominate)
      (2L, "dup text here today friend", "A"),
      (3L, "dup text here today friend", "B"), // exact copy of doc 2
      (4L, "12 34 56 78 90", "B")) // 5 ws tokens but letter_ratio 0 -> drop
      .toDF("doc_id", "text", "source")
    val card = TextAnalysis.datasetCard(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = card("A"); val b = card("B")
    assert(a.getLong(1) === 2L && a.getLong(2) === 10L) // n_docs, n_tokens
    assert(a.getLong(3) === 500L) // avg_tok_c = 10*100/2
    assert(a.getLong(4) === 1000000L) // both A docs keep
    assert(a.getLong(5) === 500000L) // doc 2 duplicated (cross-source!)
    assert(b.getLong(2) === 5L) // doc 4 has zero letter tokens
    assert(b.getLong(4) === 500000L) // doc 4 drops
    assert(b.getLong(5) === 500000L) // doc 3 duplicated
    // language columns agree with a direct langId rollup
    val langs = TextAnalysis.langId(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def top(src: String, ids: Seq[Long]) = ids.map(langs)
      .groupBy(identity).map { case (l, xs) => (-xs.size, l) }.min._2
    assert(a.getString(6) === top("A", Seq(1L, 2L)))
    assert(b.getString(6) === top("B", Seq(3L, 4L)))
  }

  test("mixSchedule: epoch 0 is proportional, last epoch equals temperatureMix's sqrt regime") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sched = TextAnalysis.mixSchedule(docs, "doc_id", "text", "source",
        budgetTokens = 20000L, epochs = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    val sources = sched.keys.map(_._2).toSet
    // epoch 0: w = n_tokens * 2 -> shares proportional to n_tokens
    val totTok = sched.collect { case ((0L, _), r) => r.getLong(3) }.sum
    for (s <- sources) {
      val r = sched((0L, s))
      assert(r.getLong(4) === r.getLong(3) * 2L, "epoch-0 weight = 2 * n_tokens")
      assert(r.getLong(5) === 20000L * (r.getLong(3) * 2L) / (totTok * 2L),
        s"epoch-0 target proportional for $s")
    }
    // epoch 2 (= epochs-1): w = 2 * floor(sqrt(n_tokens)) -> identical
    // shares/cuts to temperatureMix's pure sqrt regime
    val tm = TextAnalysis.temperatureMix(docs, "doc_id", "text", "source",
        budgetTokens = 20000L)
      .collect().map(r => r.getString(0) -> r).toMap
    for (s <- sources) {
      val r = sched((2L, s))
      assert(r.getLong(4) === 2L * tm(s).getLong(3),
        s"last-epoch weight = 2 * sqrt weight for $s")
      assert(r.getLong(5) === tm(s).getLong(4),
        s"last-epoch target equals temperatureMix target for $s")
      assert(r.getLong(6) === tm(s).getLong(5),
        s"last-epoch cut equals temperatureMix cut for $s")
    }
  }

  test("contaminationReport: verbatim copy flags both axes; paraphrase flags semantic only") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words appear here now")).toDF("doc_id", "text")
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // verbatim copy of 1
      (101L, "reworded paraphrase sharing no grams at all"))
      .toDF("doc_id", "text")
    val v1 = Seq(1.0f, 0.0f, 0.5f, 0.0f)
    val v2 = Seq(0.0f, 1.0f, 0.0f, 0.5f)
    val trainEmb = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    // eval 100 = v1 exactly; eval 101 = near-v2 (the paraphrase of 2)
    val evalEmb = Seq((100L, v1), (101L, Seq(0.01f, 0.99f, 0.01f, 0.49f)))
      .toDF("vec_id", "embedding")
    val rep = TextAnalysis.contaminationReport(train, evalDocs, trainEmb,
        evalEmb, "doc_id", "text", "vec_id", "embedding",
        n = 5, minShared = 1L, tau = 0.40)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep(100L)._1 === 1L, "verbatim copy: one lexical offender")
    assert(rep(100L)._2 === 1L, "verbatim copy: one semantic offender")
    assert(rep(100L)._3 === 1L, "verbatim copy: the same doc on both axes")
    assert(rep(101L)._1 === 0L, "paraphrase shares no grams")
    assert(rep(101L)._2 === 1L, "paraphrase caught by the embedding axis")
    assert(rep(101L)._3 === 0L)
  }

  test("contaminationReport blocked axis: planted verbatim copy flagged on both axes, matching brute") {
    import graft.operators.Similarity
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant a train-side verbatim copy of eval item 0 (text AND vector)
    val evalText = docs.where(col("doc_id") === 0L).select("text")
      .head().getString(0)
    val evalVec = emb.where(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val trainDocs = docs.where(col("doc_id") % 20 =!= 0)
      .unionByName(Seq((999000L, evalText)).toDF("doc_id", "text"))
    val trainEmb = emb.where(col("vec_id") % 20 =!= 0)
      .unionByName(Seq((999000L, evalVec)).toDF("vec_id", "embedding"))
    val evalDocs = docs.where(col("doc_id") % 20 === 0)
    val evalEmb = emb.where(col("vec_id") % 20 === 0)
    val idx = java.nio.file.Files.createTempDirectory("contam-blk")
      .toString + "/km"
    Similarity.kmeansWriteIndex(trainEmb, "vec_id", "embedding", idx,
      k = Similarity.deriveK(trainEmb.count()), iters = 2)
    def reportRow0(path: Option[String]) = TextAnalysis
      .contaminationReport(trainDocs, evalDocs, trainEmb, evalEmb,
        "doc_id", "text", "vec_id", "embedding", n = 5, minShared = 1L,
        tau = 0.95, kmeansIndexPath = path)
      .where(col("eval_id") === 0L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val brute = reportRow0(None)
    val blocked = reportRow0(Some(idx))
    assert(brute === blocked,
      s"planted eval row must match across regimes: $brute vs $blocked")
    assert(brute.head._2 >= 1L && brute.head._3 >= 1L,
      s"the verbatim copy must flag semantic and both-axes: $brute")
  }

  test("packEfficiency: exact bin/capacity/fill arithmetic, overflow tail included") {
    val docs = Seq(
      (0L, "a b c d"), (1L, "e f g h"), (2L, "i j k l")) // 4 tokens each
      .toDF("doc_id", "text")
    val got = TextAnalysis.packEfficiency(
        TextAnalysis.packSequences(docs, "doc_id", "text", budget = 10,
          docsPerShard = 100), budget = 10)
      .collect()
    assert(got.length === 1)
    val r = got.head
    // starts 0,4,8 -> bins 0,0,0 -> one bin; the tail doc OVERFLOWS the
    // bin (fill > 1e6), which is exactly what the diagnostic surfaces
    assert(r.getLong(0) === 0L && r.getLong(1) === 3L && r.getLong(2) === 12L)
    assert(r.getLong(3) === 1L && r.getLong(4) === 10L)
    assert(r.getLong(5) === 1200000L)
  }

  test("advanceTrainingShardEpoch: identical layout to a from-scratch write, no re-tokenize, crash-safe swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_adv")
      .toString + "/layout"
    TextAnalysis.writeTrainingShards(shardDocs, "doc_id", "text", dir,
      nShards = 4, epoch = 0L)
    // the epoch turn seeds from the WRITTEN layout (columnar read of
    // doc_id/text/shard/n_tokens — letterTokens never runs)
    TextAnalysis.advanceTrainingShardEpoch(spark, dir, nShards = 4,
      epoch = 7L)
    val scratch = java.nio.file.Files.createTempDirectory("graft_shards_scr")
      .toString + "/layout"
    TextAnalysis.writeTrainingShards(shardDocs, "doc_id", "text", scratch,
      nShards = 4, epoch = 7L)
    def shardFiles(root: String) = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .sortBy(_.getName)
    val advDirs = shardFiles(dir)
    val scrDirs = shardFiles(scratch)
    assert(advDirs.map(_.getName).toSeq === scrDirs.map(_.getName).toSeq)
    for ((a, s) <- advDirs.zip(scrDirs)) {
      val fa = a.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(fa.length === 1, s"${a.getName}: one file per shard dir")
      def rows(f: java.io.File) = spark.read.parquet(f.toString)
        .select("doc_id", "text", "n_tokens")
        .as[(Long, String, Long)].collect().toSeq
      assert(rows(fa.head) ===
        rows(s.listFiles().filter(_.getName.endsWith(".parquet")).head),
        s"${a.getName}: advanced row order must equal the from-scratch epoch-7 write")
    }
    // manifest rewritten from the advanced layout == from-scratch one
    def man(root: String) = spark.read.parquet(s"$root/_manifest")
      .select("shard", "n_docs", "n_tokens", "id_checksum")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(man(dir) === man(scratch))
    // no staging residue: the swap committed and cleaned up
    assert(!new java.io.File(
      graft.io.Compaction.tmpPathOf(dir)).exists(),
      "the staging dir must be gone after the swap commit")
  }

  test("end-to-end last mile: curation keepers -> shard layout, manifest accounts for every kept doc") {
    import graft.operators.{Dedup, Relational}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // the curation front half: quality gate + exact-dedup keepers
    val kept = docs
      .join(TextAnalysis.quality(docs, "doc_id", "text")
        .where(col("verdict") === "keep").select("doc_id"),
        Seq("doc_id"), "left_semi")
      .join(Dedup.exactKeepers(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val nKept = kept.count()
    assert(nKept > 0L)
    val dir = java.nio.file.Files.createTempDirectory("graft_lastmile")
      .toString
    TextAnalysis.writeTrainingShards(kept, "doc_id", "text", dir,
      nShards = 4, epoch = 0L)
    // the layout carries exactly the kept docs, nothing filtered back in
    val laid = spark.read.parquet(dir)
    assert(laid.count() === nKept)
    assert(laid.select("doc_id").except(kept.select("doc_id")).count() === 0L)
    // the manifest accounts for every kept doc across the shards
    val man = spark.read.parquet(s"$dir/_manifest")
    assert(man.agg(sum("n_docs")).head().getLong(0) === nKept)
    // md5 membership is roughly balanced: no shard above 2x fair share
    val maxShard = man.agg(max("n_docs")).head().getLong(0)
    assert(maxShard <= 2L * ((nKept / 4L) + 1L),
      s"shard skew: max $maxShard of $nKept over 4 shards")
  }

  test("dropAttribution: first-failure staging, exhaustive, keepers reconcile with the composed pipeline") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val attr = TextAnalysis.dropAttribution(docs, "doc_id", "text",
      "source", minWords = 25, cap = 10, budgetTokens = 2000L)
    val rows = attr.select("doc_id", "stage")
      .as[(Long, String)].collect().toMap
    try {
      // exhaustive and one row per input doc
      assert(rows.size.toLong === docs.count())
      assert(rows.values.toSet.subsetOf(
        Set("gopher", "cap", "budget", "kept")))
      // every stage actually bites at this SF (else the test pins nothing)
      for (s <- Seq("gopher", "cap", "budget", "kept"))
        assert(rows.values.count(_ == s) > 0, s"stage $s never fired")
      // 'gopher' is exactly the rule-failure set — attribution must not
      // leak a rules-passing doc into 'gopher' or vice versa
      val gFail = TextAnalysis.gopherRules(docs, "doc_id", "text",
          minWords = 25).where(!col("verdict"))
        .select("doc_id").as[Long].collect().toSet
      assert(rows.filter(_._2 == "gopher").keySet === gFail)
      // first-failure: compose the stages manually and check each label
      val gDocs = docs.join(
        TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 25)
          .where(col("verdict")).select("doc_id"), Seq("doc_id"), "left_semi")
      val capIds = TextAnalysis.domainCap(gDocs, "doc_id", "source", 10)
        .select("doc_id").as[Long].collect().toSet
      val capped = gDocs.where(col("doc_id").isin(capIds.toSeq: _*))
      val counts = capped.select(col("doc_id"), col("source")).join(
        TextAnalysis.dedupExactSubstrings(capped, "doc_id", "text")
          .select(col("doc_id"), col("n_kept").as("n_tok")), Seq("doc_id"))
      val keptIds = TextAnalysis.temperatureMixDocs(counts, 2000L)
        .where(col("kept")).select("doc_id").as[Long].collect().toSet
      for ((id, st) <- rows) st match {
        case "gopher" => assert(gFail.contains(id))
        case "cap"    => assert(!gFail.contains(id) && !capIds.contains(id))
        case "budget" => assert(capIds.contains(id) && !keptIds.contains(id))
        case "kept"   => assert(keptIds.contains(id))
      }
      // and the kept slice IS q_corpus_pipeline_v3's keeper set (same
      // params) — the card/pipeline/attribution artifacts reconcile
      assert(rows.filter(_._2 == "kept").keySet === keptIds)
    } finally graft.operators.Caches.release()
  }

  test("card index: incremental fold == batch card; replay and compaction change nothing") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long, Long, String, Long)] =
      df.select("source", "n_docs", "n_tokens", "avg_tok_c", "keep_ppm",
        "dup_ppm", "top_lang", "top_lang_ppm").as[(String, Long, Long, Long, Long, Long, String, Long)].collect().toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val want = rows(TextAnalysis.datasetCard(docs, "doc_id", "text", "source"))
    val path = java.nio.file.Files.createTempDirectory("graft_cardidx")
      .toString + "/card"
    // two-batch fold — the stored card equals the batch card over the
    // concatenation, including the corpus-wide dup rule ACROSS batches
    TextAnalysis.appendToCardIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", "source", path, 0L)
    TextAnalysis.appendToCardIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", "source", path, 1L)
    assert(rows(TextAnalysis.cardFromIndex(spark, path)) === want)
    // at-least-once replay of the newest batch: overwrite, not double count
    TextAnalysis.appendToCardIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", "source", path, 1L)
    assert(rows(TextAnalysis.cardFromIndex(spark, path)) === want)
    // compaction folds batch 0 into batch=-1 (newest kept out), shrinks
    // to aggregated rows, and the assembled card is unchanged
    TextAnalysis.compactCardIndex(spark, path)
    val statDirs = new java.io.File(s"$path/stats").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(statDirs === Seq("batch=-1", "batch=1"))
    assert(rows(TextAnalysis.cardFromIndex(spark, path)) === want)
    // a batch arriving after compaction still folds in correctly: move
    // one source's docs in "again" as a new batch and check against the
    // batch card over the doubled corpus
    val extra = docs.where(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    TextAnalysis.appendToCardIndex(extra, "doc_id", "text", "source",
      path, 2L)
    val want2 = rows(TextAnalysis.datasetCard(
      docs.unionByName(extra), "doc_id", "text", "source"))
    assert(rows(TextAnalysis.cardFromIndex(spark, path)) === want2)
  }

  test("calibratedQualityKeep: full buckets exact, one boundary bucket, endpoints keep all/none") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val res = TextAnalysis.calibratedQualityKeep(docs, "doc_id", "text",
        "source", keepQ = 26214L)
      .select("doc_id", "source", "avg_q", "kept")
      .as[(Long, String, Long, Boolean)].collect()
    assert(res.nonEmpty && res.exists(_._4) && res.exists(!_._4))
    for ((src, rows) <- res.groupBy(_._2)) {
      val tot = rows.length.toLong
      val target = tot * 26214L / 65536L
      val kept = rows.count(_._4).toLong
      // buckets sorted by score desc must read: fully-kept*, at most
      // one mixed (the boundary), fully-dropped* — the monotone
      // selection the quantile rule promises
      val buckets = rows.groupBy(_._3).toSeq.sortBy(-_._1)
        .map { case (_, rs) => (rs.count(_._4), rs.length) }
      val states = buckets.map { case (k, n) =>
        if (k == n) 2 else if (k == 0) 0 else 1 }
      assert(states.count(_ == 1) <= 1, s"$src: >1 mixed bucket")
      assert(states == states.sorted(Ordering[Int].reverse),
        s"$src: kept buckets must be a prefix by score: $states")
      // kept count misses target only by the boundary bucket's md5 cut
      val boundary = buckets.collect {
        case (k, n) if k > 0 && k < n => n.toLong }.sum
      assert(math.abs(kept - target) <= boundary,
        s"$src kept=$kept target=$target boundary=$boundary")
    }
    // endpoints: keepQ=65536 keeps every scored doc, keepQ=0 keeps none
    assert(TextAnalysis.calibratedQualityKeep(docs, "doc_id", "text",
      "source", 65536L).where(!col("kept")).count() === 0L)
    assert(TextAnalysis.calibratedQualityKeep(docs, "doc_id", "text",
      "source", 0L).where(col("kept")).count() === 0L)
    // empty-token docs carry no score and are excluded, not kept
    val withEmpty = docs.unionByName(Seq((999999L, "!!! 123", "web"))
      .toDF("doc_id", "text", "source"))
    assert(TextAnalysis.calibratedQualityKeep(withEmpty, "doc_id",
      "text", "source", 65536L)
      .where(col("doc_id") === 999999L).count() === 0L)
  }

  test("calibration index: fold-order-invariant thresholds; apply == direct; replay changes nothing") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val one = java.nio.file.Files.createTempDirectory("graft_cal1")
      .toString + "/hist"
    val two = java.nio.file.Files.createTempDirectory("graft_cal2")
      .toString + "/hist"
    TextAnalysis.appendToCalibrationIndex(docs, "doc_id", "text",
      "source", one, 0L)
    TextAnalysis.appendToCalibrationIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", "source", two, 0L)
    TextAnalysis.appendToCalibrationIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", "source", two, 1L)
    def thr(p: String, q: Long) =
      TextAnalysis.calibrationThresholds(spark, p, q)
        .as[(String, Long, Long, Long, Long)].collect().toSet
    // additive partials: batching cannot change the release thresholds
    assert(thr(one, 13107L) === thr(two, 13107L))
    // replaying the newest batch overwrites its own dir — no drift
    TextAnalysis.appendToCalibrationIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", "source", two, 1L)
    assert(thr(one, 13107L) === thr(two, 13107L))
    // applying the stored thresholds == the direct operator, bit-for-bit
    val viaIndex = TextAnalysis.calibratedKeepFromIndex(docs, "doc_id",
        "text", "source", two, keepQ = 26214L)
      .as[(Long, String, Long, Boolean)].collect().toSet
    val direct = TextAnalysis.calibratedQualityKeep(docs, "doc_id",
        "text", "source", keepQ = 26214L)
      .as[(Long, String, Long, Boolean)].collect().toSet
    assert(viaIndex === direct)
    // keep-everything endpoint: no boundary bucket, sentinel row
    assert(thr(one, 65536L).forall(r => r._4 === -1L && r._5 === 0L))
  }

  test("pipeline v4: stages bite in order, layout positions contiguous, easy-first order") {
    val got = SparkEntry.queries("q_corpus_pipeline_v4")(spark, sf)
      .select("doc_id", "source", "n_tok", "shard", "pos")
      .as[(Long, String, Long, Long, Long)].collect()
    try {
      assert(got.nonEmpty)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val total = docs.count()
      // upstream stages bit: the final set is a strict subset
      assert(got.length < total)
      // and specifically smaller than the gopher+calibration survivor
      // count alone (so the later stages did something too)
      val gok = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 25).where(col("verdict")).count()
      assert(got.length < gok, s"${got.length} vs gopher $gok")
      // pos is a contiguous 1..n sequence per shard
      for ((_, rs) <- got.groupBy(_._4))
        assert(rs.map(_._5).sorted.toSeq === (1L to rs.length).toSeq)
      // epoch-0 curriculum: capped n_tok never decreases along pos
      for ((_, rs) <- got.groupBy(_._4)) {
        val order = rs.sortBy(_._5).map(r => math.min(r._3, 65535L))
        assert(order.zip(order.tail).forall { case (a, b) => a <= b })
      }
    } finally graft.operators.Caches.release()
  }

  test("curriculumShards: membership == trainingShards; easy-first at epoch 0, hash order at the last") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    def shards(e: Int) = TextAnalysis.curriculumShards(docs, "doc_id",
        "text", nShards = 8, epoch = e, epochs = 3)
      .select("doc_id", "shard", "pos", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val e0 = shards(0)
    // membership is the trainingShards hash, epoch-invariant
    val want = TextAnalysis.trainingShards(docs, "doc_id", "text",
        nShards = 8, epoch = 1L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toSet
    assert(e0.map(r => (r._1, r._2)).toSet === want)
    assert(shards(2).map(r => (r._1, r._2)).toSet === want)
    // epoch 0: within every shard the capped token count never
    // decreases along the read order (pure difficulty order)
    for ((_, rs) <- e0.groupBy(_._2)) {
      val order = rs.sortBy(_._3).map(r => math.min(r._4, 65535L))
      assert(order.zip(order.tail).forall { case (a, b) => a <= b })
    }
    // last epoch: order is exactly the salted-hash order (easy-first
    // term zeroed) — recompute one shard's expected order directly
    val e2 = shards(2)
    val (shardK, rs) = e2.groupBy(_._2).head
    def h16(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"2:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
    }
    val expect = rs.map(_._1).sortBy(id => (h16(id), id)).toSeq
    assert(rs.sortBy(_._3).map(_._1).toSeq === expect,
      s"shard $shardK hash order")
    // deterministic: a re-run reproduces epoch 1 bit-for-bit
    assert(shards(1).sortBy(r => (r._2, r._3)).toSeq ===
      shards(1).sortBy(r => (r._2, r._3)).toSeq)
  }

  test("importanceSelect: target-profile docs outrank, exact hand-replayed scores, partition-invariant") {
    // two disjoint gram families (verified collision-free in 4096
    // buckets): target docs carry alpha/beta bigrams, raw docs
    // gamma/delta; two unlabeled probes imitate one family each
    val target = (0L until 10L).map(i =>
      (i, "alpha beta alpha beta alpha", true))
    val raw = (10L until 30L).map(i =>
      (i, "gamma delta gamma delta gamma", false))
    val probes = Seq(
      (100L, "alpha beta alpha beta alpha beta", false),
      (101L, "gamma delta gamma delta gamma delta", false))
    val docs = (target ++ raw ++ probes).toDF("doc_id", "text", "tgt")
    val sel = TextAnalysis.importanceSelect(docs, "doc_id", "text",
        col("tgt"), buckets = 4096, n = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rankOf = sel.map(r => (r._2, r._1)).toMap
    val scoreOf = sel.map(r => (r._2, r._3)).toMap
    // hand replay: wt(alpha beta) = 21e6 DIV 24 = 875000 (20 target
    // occurrences of 23 total +1 smoothing each); wt(beta alpha) =
    // 21e6 DIV 23 = 913043; gamma delta = 1e6 DIV 44 = 22727;
    // delta gamma = 1e6 DIV 43 = 23255
    assert(scoreOf(100L) === 3L * 875000 + 2L * 913043)
    assert(scoreOf(0L) === 2L * 875000 + 2L * 913043)
    assert(scoreOf(101L) === 3L * 22727 + 2L * 23255)
    assert(scoreOf(10L) === 2L * 22727 + 2L * 23255)
    // the target-imitating probe outranks everything; the raw-
    // imitating probe outranks only the raw docs
    assert(rankOf(100L) === 1L)
    assert((0L until 10L).map(rankOf).max < rankOf(101L))
    assert(rankOf(101L) < (10L until 30L).map(rankOf).min)
    // partition invariance: integer arithmetic + deterministic heap
    val again = TextAnalysis.importanceSelect(docs.repartition(7),
        "doc_id", "text", col("tgt"), buckets = 4096, n = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq === sel.sortBy(_._1).toSeq)
  }

  test("importanceSelectFromIndex == importanceSelect; profile partials replay idempotently") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_imp").toString
    (0L to 1L).foreach(b => TextAnalysis.appendToImportanceIndex(
      docs.where(col("doc_id") % 2 === b), "doc_id", "text",
      col("lang") === "en", dir, b, buckets = 512))
    def sel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val adhoc = sel(TextAnalysis.importanceSelect(docs, "doc_id", "text",
      col("lang") === "en", buckets = 512, n = 25))
    val stored = sel(TextAnalysis.importanceSelectFromIndex(docs, spark,
      dir, "doc_id", "text", buckets = 512, n = 25))
    assert(stored === adhoc)
    // crash-replay of a batch append is an idempotent overwrite
    TextAnalysis.appendToImportanceIndex(
      docs.where(col("doc_id") % 2 === 1L), "doc_id", "text",
      col("lang") === "en", dir, 1L, buckets = 512)
    assert(sel(TextAnalysis.importanceSelectFromIndex(docs, spark, dir,
      "doc_id", "text", buckets = 512, n = 25)) === adhoc)
    // post-compaction ensure: the folded batch dirs are deleted but
    // recorded in the manifest — a later session must NOT re-build
    // (that would double-count the folded profile partials)
    TextAnalysis.compactImportanceIndex(spark, dir, keepLast = 0)
    assert(sel(TextAnalysis.importanceSelectFromIndex(docs, spark, dir,
      "doc_id", "text", buckets = 512, n = 25)) === adhoc)
    var rebuilt = false
    TextAnalysis.ensureImportanceIndex(spark, dir, Seq(0L, 1L)) { _ =>
      rebuilt = true
    }
    assert(!rebuilt, "ensure after compaction must not re-run the build")
  }

  test("importanceSelectExternal: reduces to importanceSelect when the target is a corpus slice; external target re-ranks") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def sel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // two-relation form with target = a slice of the corpus counts
    // the SAME occurrences the one-relation predicate form counts
    val pred = col("lang") === "en"
    val one = sel(TextAnalysis.importanceSelect(docs, "doc_id", "text",
      pred, buckets = 512, n = 25))
    val two = sel(TextAnalysis.importanceSelectExternal(docs,
      docs.where(pred), "doc_id", "text", buckets = 512, n = 25))
    assert(two === one,
      "slice-target external form must equal the predicate form")
    // a genuinely external target (not a corpus subset) still ranks:
    // docs echoing the target's grams outscore the rest
    val target = Seq((9001L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val ranked = sel(TextAnalysis.importanceSelectExternal(corpus, target,
      "doc_id", "text", buckets = 4096, n = 2))
    assert(ranked.head._2 === 1L,
      "the target-echoing doc must rank first")
    assert(ranked.head._3 > ranked(1)._3)
  }

  test("importanceSelectFromIndex Laplace-smooths out-of-profile buckets (streaming not-yet-folded docs)") {
    // index built over a tiny corpus occupying a handful of buckets;
    // a NOT-yet-folded doc whose grams hash to untouched buckets must
    // score the smoothed default ((0+1)*1e6 DIV (0+1)) per gram — an
    // inner weight join would silently drop it from the ranking
    val corpus = Seq((1L, "alpha beta gamma", true),
      (2L, "alpha beta delta", false)).toDF("doc_id", "text", "tgt")
    val dir = java.nio.file.Files.createTempDirectory("graft_imp2").toString
    TextAnalysis.appendToImportanceIndex(corpus, "doc_id", "text",
      col("tgt"), dir, 0L, buckets = 4096)
    val novel = Seq((99L, "zz yy xx ww")).toDF("doc_id", "text")
    val out = TextAnalysis.importanceSelectFromIndex(novel, spark, dir,
        "doc_id", "text", buckets = 4096, n = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((99L, 3L * 1000000L)),
      "three out-of-profile bigrams must each score the smoothed 1e6")
  }

  test("pipeline v7: no two released docs share a near-dup image; the stage changes v6's release") {
    import org.apache.spark.sql.functions._
    val v7ids = graft.SparkEntry.queries("q_corpus_pipeline_v7")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(v7ids.nonEmpty)
    // the image-dedup invariant: a Hamming<=3 pair is an edge of one
    // component, and only the component MIN survives the stage — so
    // the released set can never contain both endpoints of a pair
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id").isin(v7ids: _*))
    val hs = graft.operators.Multimodal.imageAHash(
        graft.operators.Multimodal.pngTable(docs))
      .collect().map(h => h.doc_id -> h.phash)
    val bad = for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)
    assert(bad.isEmpty,
      s"released docs still carry near-dup images: ${bad.take(5).toSeq}")
    // and the stage bites: v6 (no image stage) releases a different set
    val v6ids = graft.SparkEntry.queries("q_corpus_pipeline_v6")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(v6ids.toSet != v7ids.toSet,
      "the image stage must change the release")
  }
}
