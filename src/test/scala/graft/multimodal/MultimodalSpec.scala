package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stub decoder derives metadata from bytes, including non-ASCII payloads") {
    val ascii = MediaPayload(1L, "image/stub", "abc".getBytes("UTF-8"))
    val m = new StubDecoder().decode(ascii)
    assert(m === MediaMeta(1L, "image/stub", 3, 64 + 3, 64 + 1, 3, 'a' + 'b' + 'c'))

    // ü is 2 UTF-8 bytes (0xC3 0xBC): checksum sums UNSIGNED byte values.
    val unicode = MediaPayload(2L, "image/stub", "ü".getBytes("UTF-8"))
    val mu = new StubDecoder().decode(unicode)
    assert(mu.n_bytes === 2)
    assert(mu.checksum === 0xC3 + 0xBC)
  }

  test("extractFeatures builds exact 16-bin byte histograms") {
    import spark.implicits._
    val docs = Seq((1L, "AB"), (2L, "")).toDF("doc_id", "text") // 'A'=0x41, 'B'=0x42
    val rows = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
      .collect().map(f => f.doc_id -> f.hist).toMap
    assert(rows(1L).toSeq === Seq(0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(rows(2L).sum === 0)
  }

  test("sampleFrames emits every stride-th frame with exact coordinates") {
    import spark.implicits._
    // 2500-byte payload, 1 KiB frames -> frames 0,1,2; stride 2 keeps 0,2.
    val docs = Seq((5L, "x" * 2500)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, Multimodal.withPayload(docs),
        frameBytes = 1024, stride = 2)
      .collect().map(f => (f.frame_idx, f.frame_offset, f.frame_len)).sorted
    assert(frames.toSeq === Seq((0, 0, 1024), (2, 2048, 452)))
  }

  test("frameHashes keys aligned shared segments identically across docs") {
    import spark.implicits._
    val shared = "s" * 64 // exactly one frame
    val docs = Seq(
      (1L, shared + "tail one"),
      (2L, shared + "another tail"),
      (3L, "completely different payload body")).toDF("doc_id", "text")
    val fh = Multimodal.frameHashes(spark, Multimodal.withPayload(docs),
        frameBytes = 64, stride = 1)
      .collect().groupBy(_.doc_id).map { case (d, fs) =>
        d -> fs.sortBy(_.frame_idx).map(_.fh).toSeq
      }
    // Frame 0 of docs 1 and 2 is the same 64 bytes -> same key; their
    // frame 1 (different tails) and doc 3's frames differ.
    assert(fh(1L).head === fh(2L).head)
    assert(fh(1L)(1) !== fh(2L)(1))
    assert(!fh(3L).contains(fh(1L).head))
    // The key is md5-64 of the UPPERCASE hex of the frame bytes — the
    // exact recipe the DuckDB oracle re-derives.
    val hex = shared.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").mkString
    val expected = graft.dedup.SimHash64.md5Hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(hex))
    assert(fh(1L).head === expected)
  }

  test("frameHashes hashes the short last frame over its real length only") {
    import spark.implicits._
    val docs = Seq((7L, "x" * 70)).toDF("doc_id", "text") // frames: 64 + 6
    val fh = Multimodal.frameHashes(spark, Multimodal.withPayload(docs),
        frameBytes = 64, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(fh.length === 2)
    val hexShort = "78" * 6 // 'x' = 0x78, six trailing bytes
    assert(fh(1).fh === graft.dedup.SimHash64.md5Hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(hexShort)))
  }

  test("resizeStub scales into the bounding box and checksums the byte subsample") {
    import spark.implicits._
    // "abcd": n=4 -> w=68, h=66 -> out 64x62 (aspect floor-preserved);
    // m = min(4, 64) = 4 samples at indices 0,1,2,3 -> full sum.
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val rows = Multimodal.resizeStub(spark, Multimodal.withPayload(docs), maxDim = 64)
      .collect().map(r => r.doc_id -> r).toMap
    val r1 = rows(1L)
    assert((r1.src_w, r1.src_h) === (68, 66))
    assert((r1.out_w, r1.out_h) === (64, 66 * 64 / 68))
    assert(r1.sample_checksum === "abcd".getBytes("UTF-8").map(_ & 0xFF).sum.toLong)
    // Empty payload: geometry from n=0 (64x64 -> 64x64), zero checksum.
    val r2 = rows(2L)
    assert((r2.out_w, r2.out_h) === (64, 64))
    assert(r2.sample_checksum === 0L)
    // Subsampling: m < n takes every (n/m)-th byte, nearest-neighbor.
    val wide = Seq((3L, "x" * 600)).toDF("doc_id", "text")
    val r3 = Multimodal.resizeStub(spark, Multimodal.withPayload(wide), maxDim = 64)
      .collect().head
    val m = math.min(600, r3.out_w)
    assert(r3.sample_checksum === m.toLong * 'x')
  }

  test("decodeMeta runs the per-partition decode end-to-end with the typed schema") {
    import spark.implicits._
    val docs = Seq((10L, "hello"), (11L, "wörld")).toDF("doc_id", "text")
    val out = Multimodal.decodeMeta(spark, Multimodal.withPayload(docs))
    assert(out.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "channels", "checksum"))
    val rows = out.collect().map(m => m.doc_id -> m).toMap
    assert(rows(10L).n_bytes === 5)
    assert(rows(10L).checksum === "hello".getBytes("UTF-8").map(_ & 0xFF).sum.toLong)
    assert(rows(11L).n_bytes === 6) // ö is two bytes
    assert(rows(11L).checksum === "wörld".getBytes("UTF-8").map(_ & 0xFF).sum.toLong)
  }
}
