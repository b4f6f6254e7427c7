package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus typed metadata —
  * the layout a 100 TB training-data lake uses (parquet binary column
  * chunks; no per-file blob storage round-trips). The testdata has no
  * real media, so [[mediaTable]] synthesizes payloads from document
  * text bytes; the *decode* step is an explicitly-marked deterministic
  * STUB (this container has no image/audio codecs), while everything
  * Spark-side — schema, binary slicing, partition-batched decode via
  * `mapPartitions`, feature vectors — is real and tested.
  *
  * Scale notes: `frameSample` is pure codegen'd expressions (substring
  * on binary, no UDF); `decodeStub`/`byteHistogram` run once per
  * partition with an iterator (no per-row lambda setup, no driver
  * collect), which is the Scala analogue of a batched `mapInPandas`
  * decode.
  */
object Multimodal {

  /** Opaque media payload + typed metadata, synthesized from documents:
    * (doc_id, media_type, content: binary, n_bytes). */
  def mediaTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))
      .withColumn("n_bytes", length(col("content")).cast("long"))

  /** Fixed-size frame sampling: the first `n` frames of `frameSize`
    * bytes each, one output row per non-empty frame. Pure expression
    * plan — posexplode over a sequence literal + binary substring, all
    * inside whole-stage codegen; no shuffle. */
  def frameSample(media: DataFrame, frameSize: Int, n: Int): DataFrame =
    media.select(col("doc_id"), col("media_type"),
      posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "__i")),
      col("content"))
      .select(col("doc_id"), col("media_type"), col("frame_idx").cast("long").as("frame_idx"),
        substring(col("content"), (col("frame_idx") * frameSize + 1).cast("int"),
          lit(frameSize)).as("frame"))
      .where(length(col("frame")) > 0)

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  case class Decoded(doc_id: Long, media_type: String, width: Int, height: Int,
      n_pixels: Long)
  /** Byte-level features: float histogram + entropy (spec-asserted;
    * transcendental, so not oracle-hashable) and exact integer
    * summaries (distinct byte values, modal byte + its count, weighted
    * checksum) that any SQL engine reproduces bit-for-bit. */
  case class Featured(doc_id: Long, histogram: Array[Float], entropy: Double,
      n_distinct_bytes: Int, mode_byte: Int, mode_count: Long,
      byte_checksum: Long)

  /** STUB decode — the real implementation would call an image/audio
    * codec on `content` here (none is installed in this container). The
    * stand-in derives deterministic fake dimensions from the payload
    * length so the full pipeline (schema in → partition-batched decode
    * → typed schema out) is exercised and oracle-checkable. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { m =>
        val nBytes = m.content.length
        val width = nBytes % 317 + 1   // ??? real codec: decode header
        val height = nBytes / width + 1 // ??? real codec: decode header
        Decoded(m.doc_id, m.media_type, width, height, width.toLong * height)
      }
    }
  }

  case class Resized(doc_id: Long, media_type: String, content: Array[Byte],
      orig_bytes: Int, new_bytes: Int)

  /** STUB resize — a real implementation would decode, scale, re-encode
    * (no codec in this container). The stand-in subsamples every k-th
    * byte of the payload (deterministic, content-dependent), keeping the
    * pipeline shape honest: binary in → smaller binary out, computed
    * partition-batched with no shuffle. */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    require(factor >= 1)
    media.mapPartitions { it =>
      it.map { m =>
        val out = new Array[Byte]((m.content.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = m.content(i * factor); i += 1 }
        Resized(m.doc_id, m.media_type, out, m.content.length, out.length)
      }
    }
  }

  /** Real feature extraction: 256-bin byte histogram (normalized) +
    * Shannon entropy per payload, computed partition-batched. This is
    * the shape of a real embed/feature step: binary in, fixed-dim
    * Array[Float] out, no shuffle, one pass. */
  def byteHistogram(media: Dataset[MediaRow]): Dataset[Featured] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val counts = new Array[Long](256)
        var i = 0
        while (i < m.content.length) {
          counts(m.content(i) & 0xFF) += 1; i += 1
        }
        val n = math.max(1L, m.content.length.toLong)
        val hist = counts.map(c => (c.toDouble / n).toFloat)
        val entropy = counts.foldLeft(0.0) { (acc, c) =>
          if (c == 0) acc
          else { val p = c.toDouble / n; acc - p * math.log(p) / math.log(2) }
        }
        var distinct = 0
        var modeByte = 0
        var modeCount = 0L
        var checksum = 0L
        var b = 0
        while (b < 256) {
          val c = counts(b)
          if (c > 0) {
            distinct += 1
            checksum += b.toLong * c
            if (c > modeCount) { modeCount = c; modeByte = b } // lowest byte wins ties
          }
          b += 1
        }
        Featured(m.doc_id, hist, entropy, distinct, modeByte, modeCount, checksum)
      }
    }
  }

  case class AudioWindow(doc_id: Long, win_idx: Long, n_samples: Int,
      energy: Long, peak: Int)

  /** Sliding analysis windows over an audio payload — the STFT/VAD
    * framing step of an audio pipeline. The payload is interpreted as
    * 8-bit PCM samples (the testdata has no real audio; a real decoder
    * would emit 16-bit PCM here — same framing, different stride);
    * windows of `winSize` samples every `hop` samples, each summarized
    * by integer energy (sum of squared centered samples) and peak
    * amplitude — exact integer arithmetic, deterministic.
    *
    * Partition-batched like the other media ops: windows of one payload
    * never cross rows, so there is NO shuffle — fan-out is row-local,
    * and at 100 TB each task streams its parquet binary chunk once. */
  def audioWindows(media: Dataset[MediaRow], winSize: Int, hop: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(winSize >= 1 && hop >= 1)
    media.flatMap { m =>
      val n = m.content.length
      val nWin = if (n < winSize) 0 else (n - winSize) / hop + 1
      (0 until nWin).iterator.map { w =>
        var energy = 0L
        var peak = 0
        var i = w * hop
        val end = i + winSize
        while (i < end) {
          val s = (m.content(i) & 0xFF) - 128 // center unsigned 8-bit PCM
          energy += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        AudioWindow(m.doc_id, w.toLong, winSize, energy, peak)
      }
    }
  }

  /** [[audioWindows]] for 16-bit little-endian PCM payloads: byte pairs
    * decode to signed int16 samples (a trailing odd byte is ignored),
    * then the same winSize/hop sliding energy+peak. Same scale shape:
    * row-local fan-out, no shuffle, windows stream out of each task. */
  def audioWindowsPcm16(media: Dataset[MediaRow], winSize: Int, hop: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    require(winSize >= 1 && hop >= 1)
    media.flatMap { m =>
      val nSamples = m.content.length / 2
      val nWin = if (nSamples < winSize) 0 else (nSamples - winSize) / hop + 1
      (0 until nWin).iterator.map { w =>
        var energy = 0L
        var peak = 0
        var i = w * hop
        val end = i + winSize
        while (i < end) {
          val s = ((m.content(2 * i) & 0xFF) | (m.content(2 * i + 1) << 8)).toShort.toInt
          energy += s.toLong * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 1
        }
        AudioWindow(m.doc_id, w.toLong, winSize, energy, peak)
      }
    }
  }
}
