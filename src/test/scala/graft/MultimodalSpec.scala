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

  test("decodeStub: deterministic dims, n_pixels == width*height") {
    import spark.implicits._
    val decoded = Multimodal.decodeStub(
      media.select(col("doc_id"), col("media_type"), col("content"))
        .as[Multimodal.MediaRow])
    val bad = decoded.toDF().where(
      col("n_pixels") =!= col("width").cast("long") * col("height") ||
        col("width") < 1 || col("width") > 317 || col("height") < 1)
    assert(bad.count() == 0)
    assert(decoded.count() == media.count())
  }

  test("resizeStub: 4x subsample keeps every 4th byte, size is ceil(n/4)") {
    import spark.implicits._
    val resized = Multimodal.resizeStub(
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
}
