package graft.hll

import java.lang.reflect.Constructor

import com.clearspring.analytics.stream.cardinality.{HyperLogLogPlus, RegisterSet}

/**
 * Allocation-lean view of a DENSE StreamLib sketch, for the per-row hot
 * paths (running/sliding window re-merge, fused window estimation).
 *
 * A windowed `hll_merge` evaluates once per ROW, and the stock path pays
 * three per-row constants that dominate q62/q171-shaped plans:
 *
 *  1. `HyperLogLogPlus.Builder.build` per incoming sketch — a full parser
 *     + wrapper-object allocation chain, for bytes whose dense layout is
 *     three varints and a packed register array;
 *  2. register-by-register `addAll` merge;
 *  3. `cardinality()` per output row, whose small-range branch rebuilds a
 *     ~200-entry TreeMap for the HLL++ bias interpolation on EVERY call.
 *
 * This class replaces (1) with a direct varint-header parse into the
 * library's own public `RegisterSet(count, bits)`, (2) with the public
 * word-level `RegisterSet.merge`, and (3) with a register-state-keyed
 * memo in front of the REAL `HyperLogLogPlus.cardinality()` — the
 * estimator itself is never reimplemented, so estimates are bit-identical
 * to the stock path by construction (pinned by FastStrmSpec against
 * random sketches across the linear-counting, bias-corrected, and raw
 * regimes). The memo works because a running window's register state
 * converges: once a group saturates, every subsequent row re-estimates
 * the same registers.
 *
 * The wrapper `HyperLogLogPlus` SHARES this instance's RegisterSet (via
 * the package's register-set constructor, reached reflectively — stream-lib
 * is a classpath jar in the unnamed module, so setAccessible is
 * unconditional), which keeps serialize/merge/estimate views consistent
 * with zero copies.
 */
final class FastStrmInstance(val p: Int, val rs: RegisterSet) extends HllInstance {

  /** Real stream-lib object over the SAME registers — the bit-identical
   * fallback for serialize / estimate / cross-format merge. */
  lazy val wrapper: HyperLogLogPlus = FastStrm.wrap(p, rs)

  override def offer(hashedValue: Long): HllInstance = {
    wrapper.offerHashed(hashedValue)
    this
  }

  override def merge(other: HllInstance): HllInstance = other match {
    case f: FastStrmInstance if f.p == p =>
      rs.merge(f.rs)
      this
    case f: FastStrmInstance =>
      // Different precisions: delegate for the library's own error message.
      wrapper.addAll(f.wrapper)
      this
    case s: StreamLibInstance =>
      wrapper.addAll(s.hll)
      this
    case _ => HllFormat.mixedMerge(this, other)
  }

  override def serialize: Array[Byte] = FastStrm.serializeDense(this)

  override def cardinality: Long = FastStrm.memoizedCardinality(this)
}

object FastStrm {

  /** The one reflective seam: stream-lib's package-private
   * `HyperLogLogPlus(p, sp, RegisterSet)` constructor. Looked up ONCE,
   * and strictly optional — if a stream-lib upgrade ever removes or
   * reshapes it, `available` turns false and every entry point below
   * returns null, so callers take the stock Builder path and estimates
   * cannot change (FastStrmSpec asserts the force-disabled path). */
  private val registerSetCtor: Option[Constructor[HyperLogLogPlus]] =
    try {
      val c = classOf[HyperLogLogPlus].getDeclaredConstructor(
        java.lang.Integer.TYPE, java.lang.Integer.TYPE, classOf[RegisterSet])
      c.setAccessible(true)
      Some(c)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Test hook: force the stock path even when the constructor resolved. */
  @volatile private[graft] var forceDisabled: Boolean = false

  private def available: Boolean = registerSetCtor.isDefined && !forceDisabled

  private[hll] def wrap(p: Int, rs: RegisterSet): HyperLogLogPlus =
    registerSetCtor match {
      case Some(c) => c.newInstance(Int.box(p), Int.box(0), rs)
      case None => throw new IllegalStateException(
        "FastStrm.wrap reached without the register-set constructor — " +
          "parse() should have returned null")
    }

  /**
   * Parse dense-normal STRM bytes (the encoding every sketch this library
   * writes uses: negative version header, varint p/sp, format tag 0, varint
   * byte length, packed big-endian register words) without the Builder
   * allocation chain. Returns null for anything else — sparse sketches,
   * other versions, foreign bytes — so callers can fall back to the stock
   * decoder and its diagnostics.
   */
  def parse(bytes: Array[Byte]): FastStrmInstance = {
    if (!available || bytes == null || bytes.length < 8) return null
    val version = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    if (version >= 0) return null // legacy non-varint encoding
    var pos = 4
    def varint(): Int = {
      var v = 0
      var shift = 0
      while (shift < 35) {
        if (pos >= bytes.length) return -1
        val b = bytes(pos)
        pos += 1
        v |= (b & 0x7f) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      -1
    }
    val p = varint()
    val sp = varint()
    val formatType = varint()
    if (p < 4 || p > 30 || sp != 0 || formatType != 0) return null
    val size = varint()
    if (size < 0 || bytes.length - pos != size || (size & 3) != 0) return null
    // Hand-rolled big-endian word read: Bits.getBits does the same through a
    // DataInputStream over a defensive byte copy — visible at the top of
    // window-stage stack samples before this rewrite.
    val n = size >> 2
    val words = new Array[Int](n)
    var i = 0
    var o = pos
    while (i < n) {
      words(i) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      i += 1
      o += 4
    }
    new FastStrmInstance(p, new RegisterSet(1 << p, words))
  }

  /**
   * Content-keyed parse cache for merge ARGUMENTS. A sliding window frame
   * has no inverse for sketch union, so Spark re-runs the frame's updates
   * for every output row — the same serialized sketch is re-parsed once
   * per frame position (7× for a 7-day frame). Correctness never depends
   * on the hash: a hit requires full byte equality, a collision just
   * overwrites the slot. Returned instances are SHARED and must only be
   * used as the read-only right-hand side of a merge — adopting one as a
   * mutable buffer is the caller's bug (use [[parse]] for that).
   */
  private final class ParseCache {
    private val Mask = 255
    private val keys = new Array[Array[Byte]](Mask + 1)
    private val vals = new Array[FastStrmInstance](Mask + 1)

    private def quickHash(b: Array[Byte]): Int = {
      var h = b.length * 0x9E3779B1
      val step = (b.length >> 3) | 1
      var i = 0
      while (i < b.length) { h = h * 31 + b(i); i += step }
      h ^ (h >>> 16)
    }

    def get(bytes: Array[Byte]): FastStrmInstance = {
      val i = quickHash(bytes) & Mask
      val k = keys(i)
      if (k != null && java.util.Arrays.equals(k, bytes)) return vals(i)
      val parsed = parse(bytes)
      if (parsed != null) {
        keys(i) = bytes.clone() // callers may hand us a reusable buffer
        vals(i) = parsed
      }
      parsed
    }
  }

  private val parseCache = ThreadLocal.withInitial[ParseCache](() => new ParseCache)

  /** Per-thread caches hold register-word copies (~12 KB each at p=14) and
   * executor threads are long-lived, so both ThreadLocals are cleared when
   * the owning TASK completes (completion listeners run on the task
   * thread). One threadlocal read + long compare per call registers the
   * listener at most once per task. Outside a task (driver-side eval,
   * tests) there is nothing to hook — the caches just stay bounded. */
  private val clearHookTask = ThreadLocal.withInitial[java.lang.Long](() => java.lang.Long.valueOf(-1L))

  private def armTaskClear(): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) {
      val id = tc.taskAttemptId()
      if (clearHookTask.get().longValue() != id) {
        clearHookTask.set(java.lang.Long.valueOf(id))
        tc.addTaskCompletionListener[Unit] { _ =>
          memo.remove()
          parseCache.remove()
          clearHookTask.remove()
        }
      }
    }
  }

  /** Shared read-only decode (see [[ParseCache]]); null when not dense STRM. */
  def parseShared(bytes: Array[Byte]): FastStrmInstance = {
    if (!available) return null
    armTaskClear()
    parseCache.get().get(bytes)
  }

  /** A fresh dense instance — the allocation-lean sibling of
   * `new HyperLogLogPlus(p, 0)` for aggregation buffers. Null when the
   * reflective seam is unavailable (callers fall back to stock). */
  def create(p: Int): FastStrmInstance =
    if (!available) null else new FastStrmInstance(p, new RegisterSet(1 << p))

  /** Dense serialization, BIT-IDENTICAL to stream-lib's `getBytes` by
   * construction: for a fixed precision the dense layout is
   * [4-byte version][varint p][varint sp=0][varint format=0][varint size]
   * [big-endian register words] — everything before the words is a
   * CONSTANT for that p, so it is taken verbatim from one real
   * `getBytes` of an empty sketch (cached per p, per JVM) and only the
   * word fill is hand-rolled. The stock path pays a fresh
   * ByteArrayOutputStream/DataOutputStream chain and a per-word stream
   * write on EVERY call — the top of the daily-sketch aggregation's
   * profile (each group serializes at the partial boundary and again at
   * eval). Falls back to the wrapper for anything non-dense. */
  private val headerCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]

  private[hll] def serializeDense(inst: FastStrmInstance): Array[Byte] = {
    val words = inst.rs.bits()
    val header = headerCache.computeIfAbsent(inst.p, (p: Int) => {
      val full = new HyperLogLogPlus(p, 0).getBytes
      java.util.Arrays.copyOfRange(full, 0, full.length - words.length * 4)
    })
    val out = new Array[Byte](header.length + words.length * 4)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    var o = header.length
    while (i < words.length) {
      val w = words(i)
      out(o) = (w >>> 24).toByte
      out(o + 1) = (w >>> 16).toByte
      out(o + 2) = (w >>> 8).toByte
      out(o + 3) = w.toByte
      i += 1
      o += 4
    }
    out
  }

  /** Memo key: a defensive copy of the packed register words + precision,
   * content-hashed once. Full equality on hit candidates — never a
   * hash-only comparison, so a collision cannot produce a wrong estimate. */
  private final class RegState(val p: Int, val words: Array[Int]) {
    override val hashCode: Int = 31 * java.util.Arrays.hashCode(words) + p
    override def equals(o: Any): Boolean = o match {
      case r: RegState => r.p == p && java.util.Arrays.equals(r.words, words)
      case _ => false
    }
  }

  /** A running window's register state converges (the memo's whole point),
   * so a handful of in-flight groups per thread is the realistic working
   * set; 64 entries × ~12 KB at p=14 bounds the per-thread footprint at
   * ~0.8 MB (vs ~12 MB at the previous 1024), and the task-completion
   * clear releases even that. */
  private val MemoMax = 64

  private val memo =
    ThreadLocal.withInitial[java.util.LinkedHashMap[RegState, java.lang.Long]](() =>
      new java.util.LinkedHashMap[RegState, java.lang.Long](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[RegState, java.lang.Long]): Boolean = size() > MemoMax
      })

  private[hll] def memoizedCardinality(inst: FastStrmInstance): Long = {
    armTaskClear()
    val key = new RegState(inst.p, inst.rs.bits()) // bits() copies — key is stable
    val m = memo.get()
    val hit = m.get(key)
    if (hit != null) hit.longValue()
    else {
      val v = inst.wrapper.cardinality()
      m.put(key, java.lang.Long.valueOf(v))
      v
    }
  }
}
