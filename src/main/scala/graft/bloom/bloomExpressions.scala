package graft.bloom

import org.apache.datasketches.filters.bloomfilter.{BloomFilter, BloomFilterBuilder}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bloom filters — the fifth mergeable-sketch family, covering the one
 * question the others can't answer cheaply: "is THIS item in that set?".
 * The filter is a first-class `BinaryType` column (Apache DataSketches
 * BloomFilter wire format), built per group with map-side partials,
 * unioned with `bloom_merge`, queried per row with `bloom_might_contain`.
 *
 * The corpus-curation use case is membership pruning at scale: an exact
 * distinct-gram set for a 10^8-gram benchmark suite broadcast as longs is
 * ~1 GB of executor memory; the bloom filter at the same capacity and
 * fpp=1% is ~120 MB — and its false positives are harmless wherever a
 * cheap EXACT verification of the (tiny) surviving candidate stream
 * follows, which is exactly the decontamination shape
 * ([[graft.dedup.Dedup.ngramContaminationBloom]]).
 *
 * Determinism: all partials share one fixed seed and identical geometry
 * (bits, hashes derived from `expectedItems`/`fppPpm`), so unions are
 * well-defined and the same inputs produce bit-identical filters on every
 * run. A membership probe is deterministic given the filter bytes — false
 * positives are a fixed property of the built set, not run-to-run noise.
 */
object BloomDefaults {
  /** Fixed update seed: partials must agree to union, and fixing it keeps
   * filters reproducible run-to-run (DataSketches' documented default). */
  val Seed: Long = 9001L
  val FppPpm: Long = 10000L // 1%
}

private[bloom] object BloomGeometry {
  /** (numBits, numHashes) for a target capacity and false-positive rate —
   * derived once on the driver; every partial buffer uses the same. */
  def of(expectedItems: Long, fppPpm: Long): (Long, Short) = {
    val fpp = fppPpm.toDouble / 1e6
    val bits = BloomFilterBuilder.suggestNumFilterBits(expectedItems, fpp)
    val hashes = BloomFilterBuilder.suggestNumHashes(expectedItems, bits)
    (bits, hashes)
  }
}

sealed abstract class BloomAgg extends TypedImperativeAggregate[Option[BloomFilter]]
  with UnaryLike[Expression] {

  def expectedItems: Long
  def fppPpm: Long

  // Validated at analysis time, not in the constructor (see KllAgg note).
  protected def checkParams(): TypeCheckResult =
    if (expectedItems >= 1 && fppPpm >= 1 && fppPpm < 1000000) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom expectedItems must be >= 1 and fppPpm in [1, 1e6), got $expectedItems/$fppPpm")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[BloomFilter] = None

  protected def newFilter: BloomFilter = {
    val (bits, hashes) = BloomGeometry.of(expectedItems, fppPpm)
    BloomFilterBuilder.createBySize(bits, hashes, BloomDefaults.Seed)
  }

  override def merge(buffer: Option[BloomFilter], other: Option[BloomFilter]): Option[BloomFilter] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.union(b); Some(a)
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[BloomFilter]): Any = buffer.map(_.toByteArray).orNull

  override def serialize(buffer: Option[BloomFilter]): Array[Byte] =
    buffer.map(_.toByteArray).orNull

  // Convention (matches KllAgg/FreqAgg): merge receivers are always
  // filters this class constructed; heapified bytes are unioned in.
  override def deserialize(storageFormat: Array[Byte]): Option[BloomFilter] =
    Option(storageFormat).map { b =>
      val f = newFilter
      f.union(BloomFilter.heapify(Memory.wrap(b)))
      f
    }
}

/** `bloom_init_agg(expr[, expectedItems[, fppPpm]])` → one binary bloom
 * filter per group over the (string-cast) values; nulls skipped; empty
 * group → null. Geometry sized for `expectedItems` at `fppPpm` (parts per
 * million) false-positive rate. */
case class BloomInitAgg(
    child: Expression,
    expectedItems: Long = 1L << 20,
    fppPpm: Long = BloomDefaults.FppPpm,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BloomAgg with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else checkParams()
  }

  override def update(buffer: Option[BloomFilter], input: InternalRow): Option[BloomFilter] = {
    val value = child.eval(input)
    if (value == null) buffer
    else {
      val f = buffer.getOrElse(newFilter)
      f.update(value.asInstanceOf[UTF8String].toString)
      Some(f)
    }
  }

  override def prettyName: String = "bloom_init_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_merge(filter[, expectedItems[, fppPpm]])` → union of previously
 * materialized bloom filters (all built with the same geometry). */
case class BloomMergeAgg(
    child: Expression,
    expectedItems: Long = 1L << 20,
    fppPpm: Long = BloomDefaults.FppPpm,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BloomAgg {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => checkParams()
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[BloomFilter], input: InternalRow): Option[BloomFilter] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val incoming = BloomFilter.heapify(Memory.wrap(bytes))
        buffer match {
          case Some(a) => a.union(incoming); Some(a)
          case None =>
            val f = newFilter
            f.union(incoming)
            Some(f)
        }
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def prettyName: String = "bloom_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_might_contain(filter, value)` → false means DEFINITELY absent;
 * true means present up to the filter's false-positive rate. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BooleanType

  // One heapify per filter byte-array identity, not per row: the probe side
  // typically evaluates the same broadcast filter across millions of rows.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  override def nullSafeEval(filterBytes: Any, item: Any): Any = {
    val bytes = filterBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedFilter = BloomFilter.heapify(Memory.wrap(bytes))
      cachedBytes = bytes
    }
    cachedFilter.query(item.asInstanceOf[UTF8String].toString)
  }

  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bloom_fill_fraction(filter)` → fraction of set bits — the saturation
 * gauge (≳ 0.5 means the filter is over capacity and FPs spike). */
case class BloomFillFraction(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(filterBytes: Any): Any =
    BloomFilter.heapify(Memory.wrap(filterBytes.asInstanceOf[Array[Byte]]))
      .getFillPercentage

  override def prettyName: String = "bloom_fill_fraction"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
