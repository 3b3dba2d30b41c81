package graft.hll

import java.io.{ByteArrayInputStream, DataInputStream}

import com.clearspring.analytics.stream.cardinality.{HyperLogLogPlus, RegisterSet}
import com.clearspring.analytics.util.{Bits, Varint}
import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.SparkSession

/**
 * A live, mutable HLL sketch of one wire format.
 *
 * The contract mirrors the reference library's `Instance` seam
 * (reference: alchemy/src/main/scala/com/swoop/alchemy/spark/expressions/hll/Implementation.scala:13-21)
 * so that other mergeable sketches (theta, KLL, ...) can slot in behind the
 * same four operations later.
 *
 * `offer` and `merge` may mutate and return `this`.
 */
trait HllInstance {
  def offer(hashedValue: Long): HllInstance
  def merge(other: HllInstance): HllInstance
  def serialize: Array[Byte]
  def cardinality: Long
}

/**
 * A sketch wire format: a factory for empty sketches plus a decoder for
 * serialized ones (reference: Implementation.scala:64-68).
 */
trait HllFormat extends Serializable {
  /** Canonical name, as accepted in SQL `implName` arguments. */
  def name: String
  def create(p: Int): HllInstance
  def deserialize(bytes: Array[Byte]): HllInstance
}

object HllFormat {
  /** Session conf key selecting the default format. */
  val ConfKey = "spark.graft.hll.implementation"

  /** Also honored, for drop-in compatibility with jobs written against the
   * reference library (reference: hll/package.scala:13). */
  val CompatConfKey = "com.swoop.alchemy.hll.implementation"

  val Names: Seq[String] = Seq("STRM", "STREAM_LIB", "DS", "DATASKETCHES", "GRAFT")

  /**
   * Parse a format name. `AGKN`/`AGGREGATE_KNOWLEDGE` are accepted as aliases
   * for DataSketches: the reference's second format (`net.agkn:hll`,
   * reference: Implementation.scala:92-96) is not redistributable here, and
   * DataSketches is the direction OSS Spark itself took for exposed HLL
   * sketches (Spark 3.5+ `hll_sketch_agg`).
   */
  def byName(name: String): HllFormat = name match {
    case "STRM" | "STREAM_LIB" => StreamLibHll
    case "DS" | "DATASKETCHES" | "AGKN" | "AGGREGATE_KNOWLEDGE" => DataSketchesHll
    case "GRAFT" => GraftHll
    case other => throw new IllegalArgumentException(
      s"HLL implementation '$other' is not one of the valid options: ${Names.mkString(", ")}")
  }

  /** Default format for the active session: conf key if set, else StreamLib
   * (reference precedence: HLLFunctions.scala:34-41). */
  def sessionDefault: HllFormat =
    SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption(ConfKey).orElse(s.conf.getOption(CompatConfKey)))
      .map(byName)
      .getOrElse(StreamLibHll)

  /** Full 3-level precedence: explicit name > implicitly bound format > session conf > StreamLib. */
  def resolve(name: String, bound: HllFormat): HllFormat =
    if (name != null) byName(name)
    else if (bound != null) bound
    else sessionDefault

  def resolve(bound: HllFormat): HllFormat = resolve(null, bound)

  private[hll] def mixedMerge(a: HllInstance, b: HllInstance): Nothing =
    throw new IllegalArgumentException(
      s"Cannot merge HLL sketches of different formats: ${a.getClass.getSimpleName} vs ${b.getClass.getSimpleName}")

  /** Wrap a decoder so wrong-format / corrupt bytes fail with a message that
   * names the expected format instead of an internal parser error. */
  private[hll] def decoding[A](format: HllFormat, bytes: Array[Byte])(decode: => A): A =
    try decode catch {
      case e: Exception =>
        throw new IllegalArgumentException(
          s"Cannot deserialize ${bytes.length} bytes as a ${format.name} HLL sketch. " +
            s"Was the sketch built with a different implName? (${e.getClass.getSimpleName}: ${e.getMessage})", e)
    }
}

// ---------------------------------------------------------------------------
// StreamLib (ClearSpring HyperLogLogPlus, dense/"normal" mode) — the default.
// Wire-compatible with sketches produced by the reference library's default
// format (reference: Implementation.scala:98-102; sp=0 keeps the sketch dense,
// which is what makes register-level format conversion possible).
// ---------------------------------------------------------------------------

final class StreamLibInstance(val hll: HyperLogLogPlus) extends HllInstance {
  override def offer(hashedValue: Long): HllInstance = {
    hll.offerHashed(hashedValue)
    this
  }
  override def merge(other: HllInstance): HllInstance = other match {
    case s: StreamLibInstance => hll.addAll(s.hll); this
    case f: FastStrmInstance => hll.addAll(f.wrapper); this
    case _ => HllFormat.mixedMerge(this, other)
  }
  override def serialize: Array[Byte] = hll.getBytes
  override def cardinality: Long = hll.cardinality()
}

case object StreamLibHll extends HllFormat {
  override val name = "STRM"
  /** Fresh buffers are FastStrm-backed when the seam is available: same
   * registers, same estimator, same (bit-identical, template-derived)
   * serialization — but creation skips the Builder plumbing and
   * serialize skips the stream-writer chain, which together dominate
   * sketch-aggregation profiles (one create + 1-2 serializes per group). */
  override def create(p: Int): HllInstance = {
    val f = FastStrm.create(p)
    if (f != null) f else new StreamLibInstance(new HyperLogLogPlus(p, 0))
  }
  override def deserialize(bytes: Array[Byte]): HllInstance = HllFormat.decoding(this, bytes) {
    new StreamLibInstance(HyperLogLogPlus.Builder.build(bytes))
  }

  /** Decode for a merge-only consumer: the lean dense parse when the bytes
   * allow it (every sketch this library writes), stock decoder otherwise.
   * [[FastStrmInstance]] serializes and estimates through the real
   * stream-lib object over the same registers, so the two decoders are
   * observationally identical — the fast one just skips the Builder
   * allocation chain, which is the per-row constant in windowed merges. */
  def deserializeFast(bytes: Array[Byte]): HllInstance = {
    val f = FastStrm.parse(bytes)
    if (f != null) f else deserialize(bytes)
  }

  /** Like [[deserializeFast]] but may return a SHARED cached instance —
   * only valid as the read-only right side of a merge (sliding window
   * frames re-decode the same bytes once per frame position; the content-
   * keyed cache makes those re-decodes a lookup). */
  def deserializeFastShared(bytes: Array[Byte]): HllInstance = {
    val f = FastStrm.parseShared(bytes)
    if (f != null) f else deserialize(bytes)
  }
}

// ---------------------------------------------------------------------------
// Apache DataSketches HLL — the modern, cross-system format (same library
// family as Spark 3.5+'s hll_sketch_agg and Druid/Hive/Postgres datasketches
// extensions). Substitutes for the reference's Postgres-compatible AgKn
// format, which is not available offline (SURVEY.md §7.4 R4).
// ---------------------------------------------------------------------------

final class DataSketchesInstance(private var sk: HllSketch) extends HllInstance {
  def sketch: HllSketch = sk
  override def offer(hashedValue: Long): HllInstance = {
    sk.update(hashedValue)
    this
  }
  override def merge(other: HllInstance): HllInstance = other match {
    case d: DataSketchesInstance =>
      val u = new Union(math.max(sk.getLgConfigK, d.sk.getLgConfigK))
      u.update(sk)
      u.update(d.sk)
      sk = u.getResult(TgtHllType.HLL_8)
      this
    case _ => HllFormat.mixedMerge(this, other)
  }
  override def serialize: Array[Byte] = sk.toUpdatableByteArray
  override def cardinality: Long = Math.round(sk.getEstimate)
}

case object DataSketchesHll extends HllFormat {
  override val name = "DS"
  // HllSketch supports lgK in [4, 21]; clamp the precision derived from
  // relativeSD into that window.
  override def create(p: Int): HllInstance =
    new DataSketchesInstance(new HllSketch(math.min(math.max(p, 4), 21), TgtHllType.HLL_8))
  override def deserialize(bytes: Array[Byte]): HllInstance = HllFormat.decoding(this, bytes) {
    new DataSketchesInstance(HllSketch.heapify(bytes))
  }
}

// ---------------------------------------------------------------------------
// Graft native format: a self-contained dense HLL register array that we own
// end-to-end. It exists so that sketch bytes can be transcoded out of the
// StreamLib format without recomputation (the capability the reference
// demonstrates with its STRM→AGKN converter, reference: hll/package.scala:19-61)
// and re-estimated by anything that can read 2^p bytes — including
// non-JVM systems.
//
// Register scheme matches dense HyperLogLog++ (Heule et al., 2013):
//   index = top p bits of the 64-bit hash; rank = leading zeros of the
//   remaining bits + 1. Identical to StreamLib's dense scheme, so a register
//   copy preserves the sketch contents exactly.
// ---------------------------------------------------------------------------

final class GraftHllInstance(val p: Int, val registers: Array[Byte]) extends HllInstance {
  private val m = 1 << p

  override def offer(hashedValue: Long): HllInstance = {
    val idx = (hashedValue >>> (64 - p)).toInt
    // Pad with a stop bit so rank is well-defined for hash == 0.
    val rest = (hashedValue << p) | ((1L << (p - 1)) + 1)
    val rank = (java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
    this
  }

  override def merge(other: HllInstance): HllInstance = other match {
    case g: GraftHllInstance =>
      require(g.p == p, s"Cannot merge GRAFT sketches of different precisions ($p vs ${g.p})")
      var i = 0
      while (i < m) {
        if (g.registers(i) > registers(i)) registers(i) = g.registers(i)
        i += 1
      }
      this
    case _ => HllFormat.mixedMerge(this, other)
  }

  override def serialize: Array[Byte] = {
    val out = new Array[Byte](3 + m)
    out(0) = 'G'
    out(1) = 1 // version
    out(2) = p.toByte
    System.arraycopy(registers, 0, out, 3, m)
    out
  }

  /** Standard HLL estimator with linear counting in the small range
   * (Flajolet et al., 2007; small-range correction per the HLL++ paper). */
  override def cardinality: Long = {
    val alphaMM = (if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
    else 0.7213 / (1.0 + 1.079 / m)) * m * m
    var inverseSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      inverseSum += java.lang.Math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alphaMM / inverseSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

case object GraftHll extends HllFormat {
  override val name = "GRAFT"
  override def create(p: Int): HllInstance = new GraftHllInstance(p, new Array[Byte](1 << p))
  override def deserialize(bytes: Array[Byte]): HllInstance = HllFormat.decoding(this, bytes) {
    require(bytes.length >= 3 && bytes(0) == 'G' && bytes(1) == 1,
      "Not a GRAFT v1 sketch")
    val p = bytes(2).toInt
    require(bytes.length == 3 + (1 << p), s"Corrupt GRAFT sketch: ${bytes.length} bytes for p=$p")
    new GraftHllInstance(p, java.util.Arrays.copyOfRange(bytes, 3, bytes.length))
  }

}

/**
 * Byte-level sketch transcoding between wire formats, without touching the
 * original data (capability parity with the reference's STRM→AGKN converter,
 * reference: hll/package.scala:19-61; same constraints: dense encoding only).
 *
 * Why there is no STRM→DS conversion: register transplantation requires
 * both formats to derive (index, rank) from the SAME bits of the same
 * 64-bit input hash. STRM and GRAFT both use the HLL++ dense scheme — index
 * = top p bits, rank = leading zeros of the remainder — so their registers
 * copy across losslessly. DataSketches' HllSketch instead RE-HASHES every
 * `update(long)` with its own internal murmur-based mix before deriving
 * index/rank, and its union path couples registers to that internal hash
 * (plus HIP accumulators updated per-offer). There are no bytes in a STRM
 * sketch from which DS registers could be reconstructed — the conversion is
 * information-theoretically impossible, not merely unimplemented. The
 * cross-system story for DS bytes is DataSketches' own: the same wire
 * format is readable by the DataSketches bindings in Hive/Druid/Postgres.
 * For engines with no sketch library at all, GRAFT is the exit ramp: 3
 * header bytes + 2^p plain register bytes, decodable in pure SQL (the
 * harness's hll_graft_registers query pins a DuckDB decoder against it).
 */
object SketchConvert {

  /** Parse the StreamLib dense wire format and re-emit the identical register
   * contents as a GRAFT v1 sketch. Estimates are preserved because both
   * formats index registers identically (top-p-bits / leading-zero rank). */
  def strmToGraft(bytes: Array[Byte]): Array[Byte] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readInt()
    if (version >= 0)
      throw new UnsupportedOperationException(
        "Conversion is only supported for the current StreamLib encoding (negative version header)")
    val p = Varint.readUnsignedVarInt(in)
    val sp = Varint.readUnsignedVarInt(in)
    val formatType = Varint.readUnsignedVarInt(in)
    if (formatType != 0)
      throw new UnsupportedOperationException(
        s"Conversion is only supported for the dense representation (sp=$sp, format=$formatType)")
    val size = Varint.readUnsignedVarInt(in)
    val packed = new Array[Byte](size)
    in.readFully(packed)

    val registerSet = new RegisterSet(1 << p, Bits.getBits(packed))
    val out = GraftHll.create(p).asInstanceOf[GraftHllInstance]
    var i = 0
    while (i < registerSet.count) {
      out.registers(i) = registerSet.get(i).toByte
      i += 1
    }
    out.serialize
  }
}
