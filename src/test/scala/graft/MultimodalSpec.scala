package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.Q

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaTable(Q.t(spark, sf, "documents"))

  test("mediaTable: payload bytes equal UTF-8 text bytes, typed metadata present") {
    val docs = Q.t(spark, sf, "documents")
    val joined = media.join(docs, "doc_id")
      .select(col("n_bytes"), octet_length(col("text")).cast("long").as("t_bytes"))
    assert(joined.where(col("n_bytes") =!= col("t_bytes")).count() == 0)
    assert(media.select("media_type").distinct().count() == 3)
  }

  test("frameSample: frames reassemble the prefix; partial tail frame kept") {
    val frames = Multimodal.frameSample(media, frameSize = 32, n = 4)
    // per doc: concat of frames (in order) == first 128 bytes of content
    val re = frames.groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("frame_idx"),
        col("frame").cast("string").as("f")))).getField("f")).as("prefix"))
    val truth = media.select(col("doc_id"),
      substring(col("content"), 1, 128).cast("string").as("expect"))
    val bad = re.join(truth, "doc_id").where(col("prefix") =!= col("expect"))
    assert(bad.count() == 0)
    // no empty frames, none longer than frameSize
    assert(frames.where(length(col("frame")) > 32 || length(col("frame")) === 0)
      .count() == 0)
  }

  test("pngTable + decodeImage: real PNG codec round-trip recovers formula pixels") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 7L, 28L, 100L).toDF("doc_id")
    val png = Multimodal.pngTable(docs)
    // payloads are genuine PNGs (magic bytes)
    png.collect().foreach { m =>
      assert((m.content(0) & 0xFF) == 0x89 &&
        new String(m.content.slice(1, 4)) == "PNG",
        s"doc ${m.doc_id}: payload must carry the PNG signature")
    }
    val got = Multimodal.decodeImage(png).collect()
      .map(d => d.doc_id -> d).toMap
    Seq(0L, 1L, 7L, 28L, 100L).foreach { id =>
      val d = got(id)
      val (w, h) = ((id % 29 + 4).toInt, (id % 17 + 4).toInt)
      assert(d.width == w && d.height == h, s"doc $id: header dims must decode")
      assert(d.n_pixels == w.toLong * h)
      val expectSum = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(d.px_sum == expectSum, s"doc $id: pixel sum must survive the round-trip")
    }
  }

  test("resizeImage: nearest-neighbor 2x = even-coordinate subgrid, re-decodable") {
    import spark.implicits._
    val docs = Seq(5L, 12L).toDF("doc_id")
    val resized = Multimodal.decodeImage(
      Multimodal.resizeImage(Multimodal.pngTable(docs), factor = 2))
      .collect().map(d => d.doc_id -> d).toMap
    Seq(5L, 12L).foreach { id =>
      val (w, h) = ((id % 29 + 4).toInt / 2, (id % 17 + 4).toInt / 2)
      val d = resized(id)
      assert(d.width == w && d.height == h)
      val expectSum = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + 2 * x * 7 + 2 * y * 13) % 256).sum
      assert(d.px_sum == expectSum)
    }
  }

  test("imageAHash: formula replay; scale-invariance under real resize; pair search finds the copy") {
    import spark.implicits._
    // hand-build a 16x16 gray PNG so every sample coordinate is exact
    def png16(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // per-seed gradient COEFFICIENTS (not just an offset — a constant
      // shift moves pixels and mean together and can collide hashes)
      for (y <- 0 until 16; x <- 0 until 16)
        img.getRaster.setSample(x, y, 0,
          (seed * 37 + x * (11 + seed) + y * (5 + 2 * seed)) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png16(3)),
      Multimodal.MediaRow(2L, "image", png16(9)),
      Multimodal.MediaRow(3L, "image", png16(20))).toDS()
    val hashes = Multimodal.imageAHash(rows).collect()
      .map(h => h.doc_id -> h.phash).toMap
    // formula replay for doc 1: 8x8 NN samples, integer mean threshold
    val samples = for (i <- 0 until 8; j <- 0 until 8)
      yield (i * 8 + j,
        (3 * 37 + (i * 16 / 8) * (11 + 3) + (j * 16 / 8) * (5 + 6)) % 256)
    val total = samples.map(_._2.toLong).sum
    val expect = samples.foldLeft(0L) { case (acc, (p, px)) =>
      if (px * 64 > total) acc | (1L << p) else acc }
    assert(hashes(1L) === expect)
    // REAL resize 16x16 -> 8x8: the NN sample grid lands on the same
    // source pixels, so the perceptual hash is IDENTICAL (the property
    // that makes aHash an image-dedup key: rescaled copies collide)
    val halved = Multimodal.imageAHash(
      Multimodal.resizeImage(rows.filter(_.doc_id == 1L), factor = 2)
        .map(m => m.copy(doc_id = 101L))).collect()
    assert(halved.head.width === 8)
    assert(halved.head.phash === hashes(1L), "rescaled copy must collide")
    // pair search through the SimHash hamming machinery finds the copy
    val sigs = (hashes.toSeq :+ (101L -> halved.head.phash))
      .toDF("doc_id", "simhash")
    val pairs = graft.operators.Dedup.simhashPairs(sigs, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 101L)), s"copy pair missed: $pairs")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)),
      s"unrelated images must not pair: $pairs")
  }

  test("imageAHash: color images hash by luminance, matching their gray twin (not band 0)") {
    import spark.implicits._
    // RGB image whose RED channel is CONSTANT: a band-0 hash would see
    // a flat image (degenerate), the luma hash must see the green/blue
    // gradient — pinned by equality with the grayscale twin whose gray
    // value is the exact integer Rec.601 luma of each pixel
    def rgb16(): (Array[Byte], Array[Byte]) = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gray = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = (x * 13 + y * 7) % 256
        val b = (x * 5 + y * 17) % 256
        img.setRGB(x, y, (200 << 16) | (g << 8) | b)
        gray.getRaster.setSample(x, y, 0, (299 * 200 + 587 * g + 114 * b) / 1000)
      }
      def enc(i: java.awt.image.BufferedImage) = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(i, "png", bos)
        bos.toByteArray
      }
      (enc(img), enc(gray))
    }
    val (rgbPng, grayPng) = rgb16()
    val hashes = Multimodal.imageAHash(Seq(
        Multimodal.MediaRow(1L, "image", rgbPng),
        Multimodal.MediaRow(2L, "image", grayPng)).toDS())
      .collect().map(h => h.doc_id -> h.phash).toMap
    assert(hashes(1L) === hashes(2L),
      "color image must hash by luminance, equal to its gray twin")
    // and the hash is non-degenerate: the gradient sets some bits both
    // ways (a band-0-only reader of the constant red channel would not)
    assert(hashes(1L) != 0L && hashes(1L) != -1L)
  }

  test("subsampleBytes: 4x decimation keeps every 4th byte, size is ceil(n/4)") {
    import spark.implicits._
    val resized = Multimodal.subsampleBytes(
      media.select(col("doc_id"), col("media_type"), col("content"))
        .as[Multimodal.MediaRow], factor = 4).collect()
    assert(resized.length == media.count())
    resized.foreach { r =>
      assert(r.new_bytes == (r.orig_bytes + 3) / 4)
      assert(r.content.length == r.new_bytes)
    }
    // spot-check content of doc 0
    val orig = media.where(col("doc_id") === 0).select("content")
      .head().getAs[Array[Byte]](0)
    val got = resized.find(_.doc_id == 0).get.content
    assert(got.toSeq == orig.indices.collect { case i if i % 4 == 0 => orig(i) }.toSeq)
  }

  test("byteHistogram: histogram sums to 1, entropy in [0, 8], matches local calc") {
    import spark.implicits._
    val feats = Multimodal.byteHistogram(
      media.select(col("doc_id"), col("media_type"), col("content"))
        .as[Multimodal.MediaRow])
    val rows = feats.collect()
    assert(rows.length == media.count())
    rows.foreach { f =>
      assert(f.histogram.length == 256)
      assert(math.abs(f.histogram.map(_.toDouble).sum - 1.0) < 1e-3)
      assert(f.entropy >= 0.0 && f.entropy <= 8.0)
    }
    // spot-check one doc against a driver-local recomputation
    val doc0 = media.where(col("doc_id") === 0)
      .select(col("content")).head().getAs[Array[Byte]](0)
    val counts = new Array[Long](256)
    doc0.foreach(b => counts(b & 0xFF) += 1)
    val n = doc0.length.toDouble
    val expectEntropy = counts.filter(_ > 0)
      .map(c => -(c / n) * math.log(c / n) / math.log(2)).sum
    val gotEntropy = rows.find(_.doc_id == 0).get.entropy
    assert(math.abs(gotEntropy - expectEntropy) < 1e-9)
  }

  test("CDC chunking: insertion moves only the edited region's chunks (the rsync property); dedup audit finds the planted dups") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.mediaTable(docs)
    def chunkSet(m: org.apache.spark.sql.DataFrame) =
      Multimodal.cdcChunks(m, w = 4, modulus = 64)
        .groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    val base = chunkSet(media)
    // splice a prefix into every payload: content-defined boundaries
    // re-synchronize after the edit, so AT MOST the first chunk of
    // each doc changes; fixed-size frames would ALL shift
    val prefixed = Multimodal.mediaTable(
      docs.withColumn("text", concat(lit("ZQJ XWV KYH "), col("text"))))
    val shifted = chunkSet(prefixed)
    base.foreach { case (id, hs) =>
      val kept = (hs & shifted(id)).size
      assert(kept >= hs.size - 1,
        s"doc $id: only the edit-region chunk may change ($kept of ${hs.size} kept)")
    }
    // the fixed-size contrast on the same edit: frames all shift
    val f0 = Multimodal.frameSample(media, 32, 4)
      .select(col("doc_id"), md5(col("frame")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val f1 = Multimodal.frameSample(prefixed, 32, 4)
      .select(col("doc_id"), md5(col("frame")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert((f0 & f1).size < f0.size / 4,
      "fixed framing must lose alignment under the same edit")
    // audit sanity: the fixture's planted near-dups share chunks
    val stats = Multimodal.cdcDedupStats(Multimodal.cdcChunks(media))
      .collect().map(r => (r.getString(0), r.getLong(5))).toMap
    assert(stats.values.exists(_ > 0L), s"no dedup found: $stats")
  }

  test("CDC store: arrival audit matches set arithmetic; append is membership-idempotent; absorbed batch reads fully saved") {
    import graft.operators.Multimodal
    val docs = Q.t(spark, sf, "documents")
    val corpus = Multimodal.mediaTable(docs.where(col("doc_id") % 5 =!= 0))
    val batch = Multimodal.mediaTable(docs.where(col("doc_id") % 5 === 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val idx = s"$dir/store"
    Multimodal.writeCdcIndex(corpus, idx)
    val audit = Multimodal.incrementalCdcStats(batch, spark, idx)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    graft.operators.Caches.release()
    // independent set arithmetic: novel = distinct batch hashes
    // absent from the corpus chunk-hash set
    val corpusH = Multimodal.cdcChunks(corpus)
      .select("media_type", "h").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batchCh = Multimodal.cdcChunks(batch)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    graft.operators.Caches.release()
    for ((mt, (nc, nb, nvc, nvb, saved)) <- audit) {
      val bc = batchCh.filter(_._1 == mt)
      assert(nc === bc.length && nb === bc.map(_._3).sum)
      val novel = bc.groupBy(_._2).map(_._2.head)
        .filterNot(c => corpusH.contains((mt, c._2))).toSeq
      assert(nvc === novel.length && nvb === novel.map(_._3).sum)
      assert(saved === (nb - nvb) * 1000000L / nb)
    }
    // fold the batch in; a replayed audit reads ZERO novelty (the
    // store absorbed it) and the append is membership-idempotent
    Multimodal.appendToCdcIndex(batch, spark, idx)
    val n1 = spark.read.parquet(idx).count()
    Multimodal.appendToCdcIndex(batch, spark, idx)
    assert(spark.read.parquet(idx).count() === n1)
    val after = Multimodal.incrementalCdcStats(batch, spark, idx)
      .collect().map(r => (r.getLong(3), r.getLong(5)))
    graft.operators.Caches.release()
    assert(after.forall { case (nvc, saved) => nvc == 0L && saved == 1000000L })
  }

  test("CDC minLen collapse bounds a degenerate repeated-pattern run; minLen=1 reproduces pure CDC") {
    import graft.operators.Multimodal
    import spark.implicits._
    // "aabd" is chosen so md5 of the aligned window hits ≡ 0 (mod 64):
    // a run of the repeated pattern has a cut at EVERY 4th position —
    // pure CDC degenerates to per-4-byte chunks (per-byte in the
    // single-char variant), the low-entropy-padding hazard
    val run = "aabd" * 60 // 240 bytes, cuts at 4, 8, ..., 240
    val blob = Seq((1L, "image", run)).toDF("doc_id", "media_type", "content")
    val pure = Multimodal.cdcChunks(blob, w = 4, modulus = 64, minLen = 1)
      .collect().map(r => (r.getString(2), r.getLong(3)))
    assert(pure.length === 60 && pure.forall(_._2 == 4L),
      s"the planted pattern must cut every 4 bytes without the guard " +
        s"(got ${pure.length} chunks)")
    // the default minLen chains the whole run (gaps of 4 < 16) into
    // ONE cluster -> one cut at the run end -> one 240-byte chunk
    val guarded = Multimodal.cdcChunks(blob)
      .collect().map(r => (r.getString(2), r.getLong(3)))
    assert(guarded.length === 1 && guarded.head._2 === 240L,
      s"minLen collapse must bound the degenerate run: $guarded")
    // embedded run: the collapse is local — surrounding content still
    // chunks, and total chunk count stays ∝ len/minLen, never per-byte
    val mixed = Seq((2L, "image", ("the quick brown fox " * 8) + run +
      (" jumps over the lazy dog" * 8))).toDF("doc_id", "media_type",
      "content")
    val mixedChunks = Multimodal.cdcChunks(mixed).collect()
    assert(mixedChunks.length <= mixed.head().getString(2).length / 16 + 2,
      s"chunk count must stay bounded by len/minLen: ${mixedChunks.length}")
    // consecutive kept cuts are >= minLen apart by construction, so at
    // most the first and terminal chunk of any doc may run short
    val media = Multimodal.mediaTable(
      spark.read.parquet(s"$sf/documents.parquet"))
    val shortPerDoc = Multimodal.cdcChunks(media)
      .where(col("n_bytes") < 16)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(shortPerDoc.forall(_ <= 2L),
      "interior chunks must respect the minLen floor")
  }

  test("cdcChunksFast (xxhash64): same boundary contract as the md5 twin — rsync locality, minLen floor, dedup stats in the same band") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.mediaTable(docs)
    // rsync locality: a prefix splice changes at most one chunk per doc
    def chunkSet(m: org.apache.spark.sql.DataFrame) =
      Multimodal.cdcChunksFast(m)
        .groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    val base = chunkSet(media)
    val prefixed = Multimodal.mediaTable(
      docs.withColumn("text", concat(lit("ZQJ XWV KYH "), col("text"))))
    val shifted = chunkSet(prefixed)
    base.foreach { case (id, hs) =>
      val kept = (hs & shifted(id)).size
      assert(kept >= hs.size - 1,
        s"doc $id: fast-hash boundaries lost content locality")
    }
    // minLen floor holds for the fast predicate too
    val shortPerDoc = Multimodal.cdcChunksFast(media)
      .where(col("n_bytes") < 16)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(shortPerDoc.forall(_ <= 2L))
    // the dedup audit lands in the same band as the md5 twin: the
    // planted near-dups dominate the ratio, the hash choice only
    // perturbs boundary placement
    def ppm(ch: org.apache.spark.sql.DataFrame) =
      Multimodal.cdcDedupStats(ch).collect()
        .map(r => (r.getString(0), r.getLong(5))).toMap
    val slow = ppm(Multimodal.cdcChunks(media))
    val fast = ppm(Multimodal.cdcChunksFast(media))
    slow.foreach { case (mt, s) =>
      val f = fast(mt)
      assert(f > 0L || s == 0L, s"$mt: fast path found no dedup")
      assert(math.abs(f - s) <= math.max(s, f) / 2 + 20000,
        s"$mt: dedup ppm diverged md5=$s xx=$f")
    }
    // the store lifecycle runs on the fast hash end to end: audit
    // matches the fast set arithmetic, absorbed batch reads saved
    val corpus = Multimodal.mediaTable(docs.where(col("doc_id") % 5 =!= 0))
    val batch = Multimodal.mediaTable(docs.where(col("doc_id") % 5 === 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcf").toString
    val idx = s"$dir/store_xx"
    Multimodal.writeCdcIndex(corpus, idx, family = "xx")
    val audit = Multimodal.incrementalCdcStats(batch, spark, idx,
        family = "xx")
      .collect().map(r => (r.getString(0), (r.getLong(3), r.getLong(4))))
      .toMap
    graft.operators.Caches.release()
    val corpusH = Multimodal.cdcChunksFast(corpus)
      .select("media_type", "h").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batchCh = Multimodal.cdcChunksFast(batch)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    graft.operators.Caches.release()
    for ((mt, (nvc, nvb)) <- audit) {
      val novel = batchCh.filter(_._1 == mt).groupBy(_._2).map(_._2.head)
        .filterNot(c => corpusH.contains((mt, c._2))).toSeq
      assert(nvc === novel.length && nvb === novel.map(_._3).sum,
        s"$mt: fast-store audit diverged from set arithmetic")
    }
    Multimodal.appendToCdcIndex(batch, spark, idx, family = "xx")
    val absorbed = Multimodal.incrementalCdcStats(batch, spark, idx,
        family = "xx")
      .collect().map(r => (r.getLong(3), r.getLong(5)))
    graft.operators.Caches.release()
    assert(absorbed.forall { case (nvc, saved) =>
      nvc == 0L && saved == 1000000L })
  }

  test("video near-dup: appended-trailer twins pair at high containment; alignment sensitivity is real; boilerplate guard drops hot frames") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vids = Multimodal.mediaTable(docs)
      .where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("content"))
    val pairs = Multimodal.videoNearDupPairs(
        vids.unionByName(Multimodal.videoVariantTable(docs)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val planted = docs.where(col("doc_id") % 12 === 2)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    // containment of an append twin is exactly floor(L/32)/ceil(L/32)
    // of the base frame count — high for long docs, bounded below by
    // the query threshold even for the shortest (k/(k+1) >= 1/2 at
    // k >= 1 shared frame... the query's minShared=2 floor applies)
    val lens = docs.where(col("doc_id") % 12 === 2)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    planted.foreach { b =>
      val k = lens(b) / 32 // full frames, all shared
      val n = (lens(b) + 31) / 32
      val expectPpm = k * 1000000L / n
      if (k >= 2 && expectPpm >= 500000L)
        assert(pairs.get((b, b + 4000000000L)).contains(expectPpm),
          s"append twin of $b must pair at exactly $expectPpm ppm, " +
            s"got ${pairs.get((b, b + 4000000000L))}")
    }
    assert(planted.exists(b => pairs.contains((b, b + 4000000000L))),
      "at least one append twin must surface")
    // alignment sensitivity (the documented fixed-framing trade): a
    // PREFIX splice shifts every frame — the shifted copy shares no
    // full frame with its original and must NOT pair
    val shifted = Multimodal.mediaTable(
        docs.where(col("doc_id") % 12 === 2)
          .withColumn("text", concat(lit("X"), col("text"))))
      .select((col("doc_id") + 5000000000L).as("doc_id"),
        col("media_type"), col("content"))
    val withShift = Multimodal.videoNearDupPairs(
        vids.unionByName(shifted))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    planted.foreach(b => assert(!withShift.contains((b, b + 5000000000L)),
      s"a prefix-shifted copy of $b must not pair under fixed framing " +
        "(that is what cdcChunks is for)"))
  }

  test("stored frame index: indexed pairs == ad-hoc; per-doc append replay-idempotent; clusters keep the base") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val vids = Multimodal.mediaTable(docs)
      .where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("content"))
    val corpus = vids.unionByName(Multimodal.videoVariantTable(docs))
    val frames = Multimodal.videoFrameFingerprints(corpus)
    val adhoc = Multimodal.videoNearDupPairs(corpus)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_frame").toString
    val idx = s"$dir/frames"
    Multimodal.writeFrameIndex(frames, idx)
    assert(Multimodal.videoNearDupPairsFromIndex(spark, idx)
        .collect().map(_.toString).sorted.toSeq === adhoc,
      "stored-frame pairs must be bit-identical to the ad-hoc search")
    // replayed append folds nothing (per-DOC anti-join: a doc's frame
    // set is deterministic in its payload, so doc presence == set
    // presence)
    val n1 = spark.read.parquet(idx).count()
    Multimodal.appendToFrameIndex(frames.limit(200), idx)
    assert(spark.read.parquet(idx).count() === n1,
      "replayed frame rows must append nothing")
    // genuinely new docs fold all their rows exactly once
    val extra = frames.where(col("doc_id") < 100)
      .select((col("doc_id") + 6000000000L).as("doc_id"), col("fh"))
    val nExtra = extra.count()
    assert(nExtra > 0, "fixture must have low-id video docs")
    Multimodal.appendToFrameIndex(extra, idx)
    assert(spark.read.parquet(idx).count() === n1 + nExtra)
    // cluster/keeper form: the planted append twin's representative
    // is the BASE clip (min-label), same contract as image/audio
    val clusters = graft.operators.Dedup.dedupClusters(
        Multimodal.videoNearDupPairs(corpus))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairedTwins = Multimodal.videoNearDupPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if b == a + 4000000000L => a }
    assert(pairedTwins.nonEmpty, "at least one append twin must cluster")
    pairedTwins.foreach { b =>
      assert(clusters(b + 4000000000L) == clusters(b),
        s"append twin of $b and its base must share a component")
      assert(clusters(b + 4000000000L) <= b,
        s"twin of $b must keep a representative no larger than the base")
    }
  }

  test("mediaCard: stored-artifact card equals ad-hoc recomputation per modality; zero-pair modality reads honest zeros") {
    import graft.operators.{Dedup, Multimodal}
    import graft.queries.MediaQueries
    val card = MediaQueries.queries("q_media_card")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(card.keySet === Set("image", "audio", "video"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // byte rollup recomputed ad-hoc from a fresh chunking pass
    val chunks = Multimodal.cdcChunks(Multimodal.mediaTable(docs))
    val cnt = chunks.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val bytes = chunks.join(cnt, Seq("h"))
      .groupBy(col("media_type"))
      .agg(countDistinct(col("doc_id")).as("nd"),
        sum(col("n_bytes")).as("tb"),
        sum(when(col("c") > 1, col("n_bytes")).otherwise(lit(0L))).as("db"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (mt <- Seq("image", "audio", "video")) {
      val (nd, tb, db) = bytes(mt)
      assert(card(mt)._1 == nd, s"$mt n_docs")
      assert(card(mt)._2 == tb, s"$mt total_bytes")
      assert(card(mt)._3 == db * 1000000L / tb, s"$mt dup_bytes_ppm")
    }
    // pair structure recomputed ad-hoc per modality
    def expectPairs(mt: String, pairs: org.apache.spark.sql.DataFrame)
        : Unit = {
      val p = pairs.select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val ndocs = p.flatMap(x => Seq(x._1, x._2)).distinct.length.toLong
      val nclusters = if (p.isEmpty) 0L
        else Dedup.dedupClusters(
            pairs.select(col("doc_a"), col("doc_b")))
          .select(col("cluster")).distinct().count()
      assert(card(mt)._4 == ndocs, s"$mt neardup_docs")
      assert(card(mt)._5 == nclusters, s"$mt neardup_clusters")
      assert(card(mt)._6 == ndocs - nclusters, s"$mt neardup_dropped")
    }
    expectPairs("image", Dedup.simhashPairs(
      Multimodal.imageAHash(
          Multimodal.pngTable(docs.where(col("doc_id") % 3 === 0))).toDF()
        .select(col("doc_id"), col("phash").as("simhash")),
      maxDist = 3, bits = 64))
    expectPairs("video", Multimodal.videoNearDupPairs(
      Multimodal.mediaTable(docs).where(col("media_type") === "video")))
    // the audio zeros are a real negative: docs exist, pairs don't
    assert(card("audio")._1 > 0 && card("audio")._4 == 0L &&
      card("audio")._5 == 0L && card("audio")._6 == 0L,
      "audio modality must report honest zeros over a non-empty doc set")
  }

  test("multimodal split: every union-channel pair co-assigned; cross-channel components genuinely merge") {
    import graft.operators.{Dedup, Multimodal}
    val out = graft.queries.TextQueries.queries("q_split_multimodal")(
        spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    val tp = pairsOf(Dedup.minhashDedupPairs(docs, "doc_id", "text",
      ngram = 3, numHashes = 64, bands = 16, threshold = 0.8))
    val ip = pairsOf(Dedup.simhashPairs(
      Multimodal.imageAHash(
          Multimodal.pngTable(docs.where(col("doc_id") % 3 === 0))).toDF()
        .select(col("doc_id"), col("phash").as("simhash")),
      maxDist = 3, bits = 64))
    val vp = pairsOf(Multimodal.videoNearDupPairs(
      Multimodal.mediaTable(docs).where(col("media_type") === "video")))
    // every pair from every channel lands whole in one split
    (tp ++ ip ++ vp).foreach { case (a, b) =>
      assert(out(a)._1 == out(b)._1 && out(a)._2 == out(b)._2,
        s"pair ($a, $b) must share a representative and a split")
    }
    // the union closure merges channels: a doc in BOTH the text and
    // the image graph pulls its text partner and its image partner
    // into ONE component no single channel produces
    val tdocs = tp.flatMap(p => Seq(p._1, p._2)).toSet
    val idocs = ip.flatMap(p => Seq(p._1, p._2)).toSet
    val bridges = tdocs & idocs
    assert(bridges.nonEmpty, "fixture must have text∩image bridge docs")
    val merged = bridges.exists { b =>
      val tPartners = tp.collect {
        case (a, c) if a == b => c; case (a, c) if c == b => a }
      val iPartners = ip.collect {
        case (a, c) if a == b => c; case (a, c) if c == b => a }
      tPartners.exists(x => iPartners.exists(y =>
        x != y && out(x)._1 == out(y)._1))
    }
    assert(merged, "some text partner and image partner of a bridge " +
      "doc must share a component — the union-closure guarantee")
  }

  test("stored code index: indexed pairs == ad-hoc; exact append replay-idempotent; ensure memo survives") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val codes = Multimodal.imageAHash(Multimodal.pngTable(docs)).toDF()
      .select(col("doc_id"), col("phash").as("code"))
    val adhoc = graft.operators.Dedup.simhashPairs(
        codes.select(col("doc_id"), col("code").as("simhash")))
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_code").toString
    val idx = s"$dir/codes"
    Multimodal.writeCodeIndex(codes, idx)
    def viaIndex = Multimodal.nearDupPairsFromCodeIndex(spark, idx)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex === adhoc,
      "stored-code pairs must be bit-identical to the ad-hoc search")
    // replayed append folds nothing (stored-id anti-join)
    val n1 = spark.read.parquet(idx).count()
    Multimodal.appendToCodeIndex(codes.limit(50), idx)
    assert(spark.read.parquet(idx).count() === n1,
      "replayed codes must append nothing")
    // genuinely new ids fold exactly
    Multimodal.appendToCodeIndex(
      codes.limit(5).select((col("doc_id") + 5000000L).as("doc_id"),
        col("code")), idx)
    assert(spark.read.parquet(idx).count() === n1 + 5)
  }

  test("audioFingerprint: invariant under amplitude scaling and polarity inversion; sensitive to a different signal") {
    import spark.implicits._
    def pcm(samples: Seq[Int]): Array[Byte] = {
      val out = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        out(2 * i) = (s & 0xFF).toByte
        out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      out
    }
    // deterministic small-amplitude signal so the x3 scaling stays
    // well inside int16 (exact c^2 energy scaling, no clipping)
    val base = (0 until 300).map(i => ((i * 37) % 199) - 99)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", pcm(base)),
      Multimodal.MediaRow(2L, "audio", pcm(base.map(_ * 3))),
      Multimodal.MediaRow(3L, "audio", pcm(base.map(-_))),
      Multimodal.MediaRow(4L, "audio", pcm(base.reverse))).toDS()
    val fp = Multimodal.audioFingerprint(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L)._1 == 60L, "300 samples must yield a full-width code")
    assert(fp(2L) === fp(1L), "amplitude scaling must preserve the fingerprint")
    assert(fp(3L) === fp(1L), "polarity inversion must preserve the fingerprint")
    assert(fp(4L)._2 != fp(1L)._2, "a different signal must fingerprint differently")
    // the planted variant table IS the polarity edit on real payloads
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.mediaTable(docs)
      .where(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("content"))
      .as[Multimodal.MediaRow]
    val vfp = Multimodal.audioFingerprint(
        media.unionByName(Multimodal.audioVariantTable(docs)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val variants = vfp.keys.filter(_ >= 3000000000L)
    assert(variants.nonEmpty, "fixture must plant inverted twins")
    variants.foreach(v => assert(vfp(v) === vfp(v - 3000000000L),
      s"inverted twin $v must fingerprint identically to its base"))
    // cluster/keeper form: the planted twin's component representative
    // is the BASE id (min-label), same contract as the image clusters
    val fullFp = Multimodal.audioFingerprint(
        media.unionByName(Multimodal.audioVariantTable(docs)))
      .where(col("n_bits") === 60)
      .select(col("doc_id"), col("fingerprint").as("simhash"))
    val clusters = graft.operators.Dedup.dedupClusters(
        graft.operators.Dedup.simhashPairs(fullFp, maxDist = 3, bits = 60))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullTwins = variants.filter(v => vfp(v)._1 == 60L)
    assert(fullTwins.nonEmpty, "fixture must plant full-width twins")
    fullTwins.foreach { v =>
      assert(clusters(v) == clusters(v - 3000000000L),
        s"inverted twin $v and its base must share a component")
      assert(clusters(v) <= v - 3000000000L,
        s"twin $v's representative must be no larger than its base")
    }
  }

  test("cdcChunksRolling: O(1) recurrence == direct window hash at every position; boundary contract (rsync locality, minLen floor, dedup band) holds") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.mediaTable(docs)
    // THE rolling-hash pin: the recurrence's cut set equals the one a
    // direct O(w) buzhash of every window produces — for several
    // window widths, minLen collapse off so every raw cut is compared
    val texts = docs.select(col("text")).limit(40).collect()
      .map(_.getString(0).getBytes("UTF-8"))
    for (w <- Seq(4, 16, 32, 64); c <- texts) {
      val direct = (w to c.length).filter(end =>
        (Multimodal.buzWindowHash(c, end, w) & 63L) == 0L)
      assert(Multimodal.rollingCuts(c, w, 63L, 1) === direct,
        s"w=$w: rolling recurrence diverged from the direct window hash")
    }
    // rsync locality at the family-shared w=4 params: a prefix splice
    // changes at most one chunk per doc
    def chunkSet(m: org.apache.spark.sql.DataFrame, w: Int) =
      Multimodal.cdcChunksRolling(m, w = w)
        .groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    val base = chunkSet(media, 4)
    val prefixed = Multimodal.mediaTable(
      docs.withColumn("text", concat(lit("ZQJ XWV KYH "), col("text"))))
    val shifted = chunkSet(prefixed, 4)
    base.foreach { case (id, hs) =>
      val kept = (hs & shifted(id)).size
      assert(kept >= hs.size - 1,
        s"doc $id: rolling boundaries lost content locality")
    }
    // minLen floor at the realistic w=16 defaults
    val shortPerDoc = Multimodal.cdcChunksRolling(media)
      .where(col("n_bytes") < 16)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(shortPerDoc.forall(_ <= 2L),
      "interior chunks must respect the minLen floor")
    // dedup audit in the twins' band at the shared w=4 params: the
    // planted dups dominate, the hash family only moves boundaries
    def ppm(ch: org.apache.spark.sql.DataFrame) =
      Multimodal.cdcDedupStats(ch).collect()
        .map(r => (r.getString(0), r.getLong(5))).toMap
    val slow = ppm(Multimodal.cdcChunks(media, w = 4, modulus = 64))
    val roll = ppm(Multimodal.cdcChunksRolling(media, w = 4))
    slow.foreach { case (mt, s) =>
      val f = roll(mt)
      assert(f > 0L || s == 0L, s"$mt: rolling path found no dedup")
      assert(math.abs(f - s) <= math.max(s, f) / 2 + 20000,
        s"$mt: dedup ppm diverged md5=$s buz=$f")
    }
  }

  test("chunk manifest index: stored redundancy == direct; append replay idempotent; compaction + post-compaction ensure change nothing") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.mediaTable(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = rows(Multimodal.mediaRedundancy(
      Multimodal.cdcChunks(media)))
    val dir = java.nio.file.Files.createTempDirectory("graft_chmf").toString
    val idx = s"$dir/manifest"
    (0L to 2L).foreach(b => Multimodal.appendToChunkIndex(
      Multimodal.mediaTable(docs.where(col("doc_id") % 3 === b)), idx, b))
    assert(rows(Multimodal.mediaRedundancyFromIndex(spark, idx))
      === direct, "stored manifest must replay the direct audit")
    // crash-replay of a batch append is an idempotent overwrite
    Multimodal.appendToChunkIndex(
      Multimodal.mediaTable(docs.where(col("doc_id") % 3 === 1L)), idx, 1L)
    assert(rows(Multimodal.mediaRedundancyFromIndex(spark, idx)) === direct)
    // compaction is an identity fold; a later session's ensure must
    // see the folded batches as complete (no rebuild, no double rows)
    Multimodal.compactChunkIndex(spark, idx, keepLast = 1)
    assert(rows(Multimodal.mediaRedundancyFromIndex(spark, idx)) === direct)
    var rebuilt = false
    Multimodal.ensureChunkIndex(spark, idx, Seq(0L, 1L, 2L)) { _ =>
      rebuilt = true
    }
    assert(!rebuilt, "ensure after compaction must not re-run the build")
    assert(rows(Multimodal.mediaRedundancyFromIndex(spark, idx)) === direct)
  }

  test("ensureChunkIndex: batchIds grown past a compaction builds ONLY the missing ids — folded batches never re-create") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_chgrow").toString
    val idx = s"$dir/manifest"
    // two batches land, compaction folds batch 0 (keepLast = 1)
    (0L to 1L).foreach(b => Multimodal.appendToChunkIndex(
      Multimodal.mediaTable(docs.where(col("doc_id") % 3 === b)), idx, b))
    Multimodal.compactChunkIndex(spark, idx, keepLast = 1)
    assert(graft.io.Compaction.foldedIds(spark, idx) === Set(0L))
    // batchIds has since grown to include 2: ensure must hand build
    // ONLY the genuinely missing id — rebuilding the folded batch 0
    // dir would double-count its rows against the batch=-1 fold
    var got: Seq[Long] = Nil
    Multimodal.ensureChunkIndex(spark, idx, Seq(0L, 1L, 2L)) { missing =>
      got = missing
      missing.foreach(b => Multimodal.appendToChunkIndex(
        Multimodal.mediaTable(docs.where(col("doc_id") % 3 === b)), idx, b))
    }
    assert(got === Seq(2L), s"build must receive only the missing ids, got $got")
    val direct = Multimodal.mediaRedundancy(
        Multimodal.cdcChunks(Multimodal.mediaTable(docs)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(Multimodal.mediaRedundancyFromIndex(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === direct,
      "partial rebuild must reconstruct exactly the full-corpus audit")
  }

  test("image near-dup: re-encode twins pair at Hamming 0, detectable edited twins pair, clusters keep the base") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = Multimodal.pngTable(docs)
      .unionByName(Multimodal.pngVariantTable(docs))
    val hashes = Multimodal.imageAHash(corpus)
    val hmap = hashes.collect().map(h => h.doc_id -> h.phash).toMap
    val bases = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val reenc = bases.filter(_ % 7 == 0)
    val edited = bases.filter(_ % 7 == 3)
    assert(reenc.nonEmpty && edited.nonEmpty, "fixture must plant both families")
    // re-encode survives: decoded+re-encoded PNG hashes IDENTICALLY
    reenc.foreach(b => assert(hmap(b) == hmap(b + 1000000000L),
      s"re-encode twin of $b must hash identically"))
    val pairs = Multimodal.imageNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    reenc.foreach(b => assert(pairs.get((b, b + 1000000000L)).contains(0),
      s"re-encode pair ($b) must surface at Hamming 0"))
    // pigeonhole is LOSSLESS at dist <= 3: every edited twin whose
    // true Hamming is within 3 must be in the pair list, and the
    // fixture must contain at least one such detectable edit
    val detectable = edited.filter(b =>
      java.lang.Long.bitCount(hmap(b) ^ hmap(b + 2000000000L)) <= 3)
    assert(detectable.nonEmpty, "fixture must contain a detectable edit")
    detectable.foreach(b => assert(
      pairs.get((b, b + 2000000000L)).contains(
        java.lang.Long.bitCount(hmap(b) ^ hmap(b + 2000000000L))),
      s"edited twin of $b within Hamming 3 must surface as a pair"))
    // clusters: the planted twin's representative is the BASE id
    val clusters = Multimodal.imageNearDupClusters(
        Multimodal.imageNearDupPairs(hashes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (reenc.map(b => (b, b + 1000000000L)) ++
        detectable.map(b => (b, b + 2000000000L))).foreach { case (b, v) =>
      assert(clusters(v) <= b,
        s"variant $v must cluster under a representative no larger than $b")
      assert(clusters(v) == clusters(b),
        s"variant $v and base $b must share a component")
    }
  }
}
