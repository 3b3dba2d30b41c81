package graft

import scala.util.Random

import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus
import graft.hll.{FastStrm, FastStrmInstance, StreamLibHll, StreamLibInstance}
import org.scalatest.funsuite.AnyFunSuite

/**
 * The lean dense-STRM window path must be OBSERVATIONALLY IDENTICAL to the
 * stock stream-lib decoder: same bytes out, same estimate, same merge
 * result. The estimate check deliberately spans all three estimator
 * regimes — linear counting (small), bias-corrected (estimate ≤ 5m), and
 * raw harmonic mean (large) — because the fast path memoizes in front of
 * the real estimator and must never change a single returned value.
 */
class FastStrmSpec extends AnyFunSuite {

  private def stockSketch(p: Int, values: Iterator[Long]): StreamLibInstance = {
    // Deliberately the STOCK object (create() now returns the lean
    // instance): these specs compare the fast path against it.
    val s = new StreamLibInstance(new HyperLogLogPlus(p, 0))
    values.foreach(s.offer)
    s
  }

  private val precisions = Seq(9, 12, 14)
  // Cardinalities chosen to land in linear-counting, bias, and raw ranges
  // for each p above (5m at p=14 is ~82k).
  private val cardinalities = Seq(1, 5, 100, 5000, 200000)

  test("parse round-trips bytes and reproduces the stock estimate exactly") {
    for (p <- precisions; n <- cardinalities) {
      val rnd = new Random(p * 1000003 + n)
      val bytes = stockSketch(p, Iterator.fill(n)(rnd.nextLong())).serialize
      val fast = FastStrm.parse(bytes)
      assert(fast != null, s"dense parse refused own bytes (p=$p n=$n)")
      assert(fast.p == p)
      val stock = StreamLibHll.deserialize(bytes)
      assert(fast.cardinality == stock.cardinality, s"estimate diverged at p=$p n=$n")
      assert(fast.cardinality == stock.cardinality, "memoized second call diverged")
      assert(java.util.Arrays.equals(fast.serialize, bytes), s"serialize not identity at p=$p n=$n")
    }
  }

  test("fast merge chain == stock merge chain, bytes and estimate") {
    for (p <- precisions) {
      val rnd = new Random(42 + p)
      val parts = Seq.fill(8)(stockSketch(p, Iterator.fill(3000)(rnd.nextLong())).serialize)

      val stockMerged = parts.map(StreamLibHll.deserialize).reduce(_ merge _)
      val fastMerged = parts.map(FastStrm.parse(_): graft.hll.HllInstance).reduce(_ merge _)
      assert(java.util.Arrays.equals(fastMerged.serialize, stockMerged.serialize))
      assert(fastMerged.cardinality == stockMerged.cardinality)

      // Mixed chains (fast buffer × stock incoming and vice versa) — the
      // cross-type cases SketchAgg.merge can produce after a shuffle.
      val mixedA = FastStrm.parse(parts.head).merge(StreamLibHll.deserialize(parts(1)))
      val mixedB = StreamLibHll.deserialize(parts.head).merge(FastStrm.parse(parts(1)))
      val expect = StreamLibHll.deserialize(parts.head).merge(StreamLibHll.deserialize(parts(1)))
      assert(java.util.Arrays.equals(mixedA.serialize, expect.serialize))
      assert(java.util.Arrays.equals(mixedB.serialize, expect.serialize))
    }
  }

  test("memo keys on register CONTENT: estimate tracks in-place mutation") {
    val p = 12
    val rnd = new Random(7)
    val a = FastStrm.parse(stockSketch(p, Iterator.fill(50)(rnd.nextLong())).serialize)
    val before = a.cardinality
    val extraBytes = stockSketch(p, Iterator.fill(5000)(rnd.nextLong())).serialize
    a.merge(FastStrm.parse(extraBytes))
    val after = a.cardinality
    assert(after > before)
    assert(after == StreamLibHll.deserialize(a.serialize).cardinality)
  }

  test("force-disabled fast path falls back to the stock decoder with identical estimates") {
    // The register-set constructor is reached reflectively; if a stream-lib
    // upgrade ever removes it the lookup yields None and every FastStrm
    // entry point must return null so deserializeFast* take the stock
    // Builder path. forceDisabled simulates exactly that failure mode.
    val p = 12
    val rnd = new Random(99)
    val parts = Seq.fill(6)(stockSketch(p, Iterator.fill(4000)(rnd.nextLong())).serialize)
    val expectMerged = parts.map(StreamLibHll.deserialize).reduce(_ merge _)
    FastStrm.forceDisabled = true
    try {
      assert(FastStrm.parse(parts.head) == null)
      assert(FastStrm.parseShared(parts.head) == null)
      // The public decode seams must silently take the stock path...
      val viaFast = parts.map(StreamLibHll.deserializeFast).reduce(_ merge _)
      val viaShared = parts.map(StreamLibHll.deserializeFastShared).reduce(_ merge _)
      assert(viaFast.isInstanceOf[StreamLibInstance])
      assert(viaShared.isInstanceOf[StreamLibInstance])
      // ...with byte- and estimate-identical results.
      assert(java.util.Arrays.equals(viaFast.serialize, expectMerged.serialize))
      assert(viaFast.cardinality == expectMerged.cardinality)
      assert(java.util.Arrays.equals(viaShared.serialize, expectMerged.serialize))
    } finally FastStrm.forceDisabled = false
    // Re-enabled: fast path agrees with what the disabled path produced.
    val fastAgain = parts.map(StreamLibHll.deserializeFast).reduce(_ merge _)
    assert(java.util.Arrays.equals(fastAgain.serialize, expectMerged.serialize))
    assert(fastAgain.cardinality == expectMerged.cardinality)
  }

  test("parse rejects foreign and sparse bytes (falls back to stock decoder)") {
    assert(FastStrm.parse(Array[Byte](1, 2, 3)) == null)
    assert(FastStrm.parse(graft.hll.GraftHll.create(9).serialize) == null)
    // A sparse StreamLib sketch (sp > 0) is not the dense layout.
    val sparse = new HyperLogLogPlus(12, 18)
    sparse.offerHashed(12345L)
    assert(FastStrm.parse(sparse.getBytes) == null)
    // offer() on a FastStrm instance still works through the wrapper.
    val f = FastStrm.parse(StreamLibHll.create(9).serialize).asInstanceOf[FastStrmInstance]
    f.offer(987654321L)
    assert(f.cardinality == 1L)
  }

  test("serializeDense is bit-identical to stock getBytes across precisions, fills, and merges") {
    val rnd = new scala.util.Random(41)
    for (p <- Seq(4, 8, 11, 14); n <- Seq(0, 1, 7, 500, 20000)) {
      val stock = new HyperLogLogPlus(p, 0)
      val fast = StreamLibHll.create(p)
      assert(fast.isInstanceOf[FastStrmInstance], "create() must take the lean path here")
      val values = Seq.fill(n)(rnd.nextLong())
      values.foreach { v => stock.offerHashed(v); fast.offer(v) }
      assert(java.util.Arrays.equals(fast.serialize, stock.getBytes),
        s"byte drift at p=$p n=$n")
      assert(fast.cardinality === stock.cardinality(), s"estimate drift at p=$p n=$n")
      // Survives a merge (the aggregation path: deserialize partial, merge,
      // re-serialize at eval).
      val otherVals = Seq.fill(50)(rnd.nextLong())
      val otherStock = new HyperLogLogPlus(p, 0)
      val otherFast = StreamLibHll.create(p)
      otherVals.foreach { v => otherStock.offerHashed(v); otherFast.offer(v) }
      stock.addAll(otherStock)
      val merged = fast.merge(StreamLibHll.deserializeFast(otherFast.serialize))
      assert(java.util.Arrays.equals(merged.serialize, stock.getBytes),
        s"post-merge byte drift at p=$p n=$n")
    }
  }
}
