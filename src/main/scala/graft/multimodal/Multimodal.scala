package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from one media payload. */
case class MediaMeta(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    checksum: Long)

/** (id, opaque payload) — the shape media columns travel in. */
case class MediaPayload(doc_id: Long, media_type: String, payload: Array[Byte])

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, decoded/feature-extracted in partition-sized batches.
 *
 * The decode itself is a STUB — image/audio codecs are not available in
 * this environment — but everything Spark-side is real: the binary column
 * schema, the typed `Dataset` boundary, the `mapPartitions` batch shape
 * (one decoder instance per partition, streamed row iterator, no
 * per-row setup cost), and the deterministic metadata contract that the
 * oracle checks. Swapping `StubDecoder` for a real codec changes no plan.
 */
object Multimodal {

  /** Attach a payload column. For the harness corpus the "media" is the
   * document text encoded as UTF-8 bytes — an honest stand-in: opaque,
   * variable-length, binary. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("image/stub").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /**
   * Decode payloads to typed metadata, one decoder per partition.
   *
   * At 100 TB this is the pattern that matters: decoding is per-partition
   * (amortized initialization, sequential IO within a file split), emits a
   * narrow typed row, and never widens the data — the binary column is
   * dropped by the projection immediately after the decode.
   */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { batch =>
      val decoder = new StubDecoder // one per partition, like a real codec ctx
      batch.map(decoder.decode)
    }
  }

  /**
   * Feature extraction over media payloads: a 16-bin byte-value histogram
   * per document — the stand-in for a real embedding/feature step (same
   * batch shape: per-partition extractor, bounded fixed-width output, media
   * bytes dropped immediately after). Being integer-exact it is
   * oracle-verifiable byte-for-byte, and the histogram vector can feed the
   * similarity stack downstream like any other vector column.
   */
  /**
   * Frame sampling over media payloads: treat the payload as a sequence of
   * fixed-size frames and emit every `stride`-th one — the one-to-many
   * stage of a video pipeline (a real codec would decode GOPs; the frame
   * geometry and sampling plumbing here are the real thing). Emits only
   * (offset, length) coordinates — sampling never copies or widens the
   * media bytes; downstream stages slice lazily from storage.
   */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    payloads.as[MediaPayload].mapPartitions { batch =>
      batch.flatMap { p =>
        val n = p.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val off = f * frameBytes
          MediaFrame(p.doc_id, f, off, math.min(frameBytes, n - off))
        }
      }
    }
  }

  /**
   * Resize over media payloads — the remaining stage of the classic
   * decode / feature-extract / RESIZE / frame-sample quartet. Target
   * geometry is exact integer arithmetic (aspect-preserving scale to a
   * bounding box, floor division, 1-pixel floor), and the "resized pixels"
   * are a nearest-neighbor byte subsample of the payload (index
   * i·n div m), so the stage is oracle-verifiable byte-for-byte like the
   * decode. Same batch shape as a real resampler: per-partition worker,
   * fixed-width typed output, media bytes dropped at the projection.
   */
  /**
   * Portable per-frame content hashes, one decoder-shaped pass: the same
   * frame grid as [[sampleFrames]] (fixed `frameBytes` windows, every
   * `stride`-th frame, short last frame kept), each frame keyed by the
   * md5-64 of its UPPERCASE-HEX byte encoding. Hashing the hex string —
   * not the raw bytes — is deliberate: every engine can md5 a string, so
   * DuckDB re-derives the exact key as
   * `('0x' || substr(md5(substr(hex(payload), off*2+1, len*2)), 1, 16))::UBIGINT`
   * where blob-native md5 does not exist. Same per-partition batch shape
   * as the other media stages: payload bytes are consumed inside the
   * partition and dropped at the projection — frame-level dedup
   * (cross-document repeated media segments) then runs as a plain
   * hash groupBy on (fh, doc_id) coordinates, never shuffling media.
   */
  def frameHashes(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int, stride: Int): Dataset[FrameHash] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val hexDigits = "0123456789ABCDEF".toCharArray
    payloads.as[MediaPayload].mapPartitions { batch =>
      batch.flatMap { p =>
        val n = p.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val off = f * frameBytes
          val len = math.min(frameBytes, n - off)
          val sb = new java.lang.StringBuilder(len * 2)
          var i = 0
          while (i < len) {
            val b = p.payload(off + i) & 0xFF
            sb.append(hexDigits(b >>> 4)).append(hexDigits(b & 0xF))
            i += 1
          }
          FrameHash(p.doc_id, f, graft.dedup.SimHash64.md5Hash64(
            org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
        }
      }
    }
  }

  def resizeStub(spark: SparkSession, payloads: DataFrame, maxDim: Int): Dataset[MediaResize] = {
    import spark.implicits._
    require(maxDim > 0, "maxDim must be positive")
    payloads.as[MediaPayload].mapPartitions { batch =>
      val decoder = new StubDecoder
      batch.map { p =>
        val meta = decoder.decode(p)
        val mx = math.max(meta.width, meta.height)
        val outW = math.max(1, meta.width * maxDim / mx)
        val outH = math.max(1, meta.height * maxDim / mx)
        val n = p.payload.length
        val m = math.min(n, outW)
        var sum = 0L
        var i = 0
        while (i < m) {
          sum += (p.payload(((i.toLong * n) / m).toInt) & 0xFF)
          i += 1
        }
        MediaResize(p.doc_id, meta.width, meta.height, outW, outH, sum)
      }
    }
  }

  def extractFeatures(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { batch =>
      batch.map { p =>
        val hist = new Array[Int](16)
        var i = 0
        while (i < p.payload.length) {
          hist((p.payload(i) & 0xFF) >>> 4) += 1
          i += 1
        }
        MediaFeatures(p.doc_id, hist)
      }
    }
  }
}

/** (id, 16-bin byte-value histogram) — the feature-extract stage output. */
case class MediaFeatures(doc_id: Long, hist: Array[Int])

/** One sampled frame's location inside a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, frame_offset: Int, frame_len: Int)

/** Per-frame portable content hash from [[Multimodal.frameHashes]]. */
case class FrameHash(doc_id: Long, frame_idx: Int, fh: Long)

/** Resize-stage output: source + target geometry and the deterministic
 * checksum of the nearest-neighbor byte subsample. */
case class MediaResize(doc_id: Long, src_w: Int, src_h: Int,
    out_w: Int, out_h: Int, sample_checksum: Long)

/**
 * Deterministic fake decoder. A real implementation would parse the payload
 * container (JPEG/PNG/WAV...); this derives plausible, checkable metadata
 * from the bytes alone so the whole pipeline stays oracle-verifiable:
 *   width    = 64 + n_bytes mod 512
 *   height   = 64 + (n_bytes / 2) mod 512
 *   channels = 3
 *   checksum = sum of unsigned byte values
 */
final class StubDecoder extends Serializable {
  def decode(p: MediaPayload): MediaMeta = {
    val n = p.payload.length
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += (p.payload(i) & 0xFF)
      i += 1
    }
    MediaMeta(
      doc_id = p.doc_id,
      media_type = p.media_type,
      n_bytes = n,
      width = 64 + n % 512,
      height = 64 + (n / 2) % 512,
      channels = 3,
      checksum = sum)
  }
}

/** One fixed-width analysis window of a decoded PCM stream:
 * `energy` = Σ sample², `peak` = max |sample| — the integer primitives a
 * silence detector / loudness normalizer consumes (RMS is √(energy/n),
 * left to the caller: the square root would break integer oracle parity
 * for no analytical gain). */
case class AudioWindow(doc_id: Long, win: Int, n_samples: Int,
    energy: Long, peak: Int)

/** The audio face of the stub-decode layer: payload bytes as little-endian
 * signed 16-bit PCM samples (a trailing odd byte is dropped, documented),
 * windowed energy/peak per `window` samples. Same batch shape as the
 * image path: one decoder per partition, narrow typed output, the binary
 * column never survives the projection. A real PCM/Opus decoder swaps in
 * without a plan change. */
object AudioStub {
  def windowedEnergy(spark: org.apache.spark.sql.SparkSession,
      payloads: org.apache.spark.sql.DataFrame,
      window: Int = 50): org.apache.spark.sql.Dataset[AudioWindow] = {
    require(window > 0, s"window must be positive, got $window")
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { batch =>
      batch.flatMap { p =>
        val nSamples = p.payload.length / 2
        val out = scala.collection.mutable.ArrayBuffer[AudioWindow]()
        var k = 0
        while (k < nSamples) {
          val winIdx = k / window
          val end = math.min(nSamples, (winIdx + 1) * window)
          var energy = 0L
          var peak = 0
          while (k < end) {
            val raw = (p.payload(2 * k) & 0xFF) | ((p.payload(2 * k + 1) & 0xFF) << 8)
            val s = if (raw >= 32768) raw - 65536 else raw
            energy += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            k += 1
          }
          out += AudioWindow(p.doc_id, winIdx,
            end - winIdx * window, energy, peak)
        }
        out
      }
    }
  }
}
