package graft.freq

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Frequent-items (heavy-hitters) sketches — the fourth mergeable-sketch
 * family (after HLL, KLL, theta), targeting the dominant corpus-curation
 * question "which tokens/grams/domains flood the data?". The sketch is the
 * Misra-Gries-style Apache DataSketches frequencies ItemsSketch: a
 * first-class `BinaryType` column in the standard DataSketches wire format
 * (readable from Java/C++/Python bindings), built with map-side partials,
 * re-aggregatable with `freq_merge`.
 *
 * Why a sketch and not `GROUP BY item`: boilerplate detection over a
 * 100 TB corpus has ~10^11 distinct grams. A groupBy shuffles every
 * distinct gram; this aggregate shuffles ONE bounded buffer (≤ maxMapSize
 * counters, a few hundred KB) per partition regardless of input size, and
 * the answer every pipeline actually wants — items above a support
 * threshold — is exactly what the sketch guarantees:
 *
 * - exact while distinct items ≤ ~0.75·maxMapSize (`freq_max_error` = 0);
 * - beyond that, every estimate is within `getMaximumError` ≤ N/maxMapSize
 *   of the true count, no true heavy hitter is missed
 *   (NO_FALSE_NEGATIVES), and anything reported is within error of the
 *   threshold.
 */
object FreqDefaults {
  /** Counter-map ceiling (power of 2). 1024 bounds the error at N/1024
   * while keeping a partial buffer under ~64 KB for typical gram sizes. */
  val MaxMapSize: Int = 1024
}

private[freq] object FreqSerDe {
  val serde = new ArrayOfStringsSerDe
  def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
}

sealed abstract class FreqAgg extends TypedImperativeAggregate[Option[ItemsSketch[String]]]
  with UnaryLike[Expression] {

  def maxMapSize: Int

  // No require() in the class body — Java deserialization on executors
  // invokes this constructor before case-class fields restore (see KllAgg).
  protected def checkMapSize(): TypeCheckResult =
    if (maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[ItemsSketch[String]] = None

  protected def newSketch: ItemsSketch[String] = new ItemsSketch[String](maxMapSize)

  override def merge(buffer: Option[ItemsSketch[String]],
      other: Option[ItemsSketch[String]]): Option[ItemsSketch[String]] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.merge(b); Some(a)
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[ItemsSketch[String]]): Any =
    buffer.map(_.toByteArray(FreqSerDe.serde)).orNull

  override def serialize(buffer: Option[ItemsSketch[String]]): Array[Byte] =
    buffer.map(_.toByteArray(FreqSerDe.serde)).orNull

  // Convention (matches KllAgg/ThetaAgg): a buffer that will RECEIVE merges
  // is always a sketch this class constructed via newSketch; heapified
  // bytes are merged into one, never used as the receiver directly.
  override def deserialize(storageFormat: Array[Byte]): Option[ItemsSketch[String]] =
    Option(storageFormat).map { b =>
      val sk = newSketch
      sk.merge(FreqSerDe.heapify(b))
      sk
    }
}

/** `freq_init_agg(expr[, maxMapSize])` → one binary frequent-items sketch
 * per group over the (string-cast) values; nulls skipped; empty group →
 * null. */
case class FreqInitAgg(
    child: Expression,
    maxMapSize: Int = FreqDefaults.MaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAgg with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else checkMapSize()
  }

  override def update(buffer: Option[ItemsSketch[String]], input: InternalRow): Option[ItemsSketch[String]] = {
    val value = child.eval(input)
    if (value == null) buffer
    else {
      val sk = buffer.getOrElse(newSketch)
      sk.update(value.asInstanceOf[UTF8String].toString)
      Some(sk)
    }
  }

  override def prettyName: String = "freq_init_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `freq_merge(sketch[, maxMapSize])` → union of previously materialized
 * frequent-items sketches (the store → reload → re-aggregate path). */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = FreqDefaults.MaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAgg {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => checkMapSize()
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[ItemsSketch[String]], input: InternalRow): Option[ItemsSketch[String]] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val incoming = FreqSerDe.heapify(bytes)
        buffer match {
          case Some(a) => a.merge(incoming); Some(a)
          case None =>
            val sk = newSketch
            sk.merge(incoming)
            Some(sk)
        }
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def prettyName: String = "freq_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[freq] object FreqEval {
  val itemsType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  def sketch(bytes: Any): ItemsSketch[String] =
    FreqSerDe.heapify(bytes.asInstanceOf[Array[Byte]])

  /** NO_FALSE_NEGATIVES candidates with estimate >= threshold, as a
   * deterministically ordered (cnt desc, item asc) struct array. In exact
   * mode (maxError 0) this is precisely the items with true count >=
   * threshold; in approximate mode no item with true count >= threshold +
   * maxError is missed. */
  def itemsAbove(sk: ItemsSketch[String], threshold: Long): ArrayData = {
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .filter(_.getEstimate >= threshold)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => InternalRow(UTF8String.fromString(r.getItem), r.getEstimate))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

/** `freq_items(sketch, minCount)` → array<struct<item, cnt>> of the items
 * whose estimated count is at least `minCount`, ordered (cnt desc, item). */
case class FreqItems(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = FreqEval.itemsType

  override def nullSafeEval(sketchBytes: Any, minCount: Any): Any =
    FreqEval.itemsAbove(FreqEval.sketch(sketchBytes), minCount.asInstanceOf[Long])

  override def prettyName: String = "freq_items"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `freq_items_by_support(sketch, ppm)` → items whose estimated count is at
 * least `ppm` parts-per-million of the stream length — the scale-free form
 * ("every gram above 0.5% of the corpus") that survives any corpus size.
 * The threshold ceil(streamLength·ppm/10^6) is computed in exact integer
 * arithmetic (BigInt — streamLength·ppm may exceed 2^63 at full scale). */
case class FreqItemsBySupport(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = FreqEval.itemsType

  override def nullSafeEval(sketchBytes: Any, ppm: Any): Any = {
    val sk = FreqEval.sketch(sketchBytes)
    val p = ppm.asInstanceOf[Long]
    val threshold = ((BigInt(sk.getStreamLength) * p + 999999) / 1000000).toLong
    FreqEval.itemsAbove(sk, threshold)
  }

  override def prettyName: String = "freq_items_by_support"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `freq_estimate(sketch, item)` → estimated count of one item (0 when
 * absent; exact when `freq_max_error(sketch)` is 0). */
case class FreqEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(sketchBytes: Any, item: Any): Any =
    FreqEval.sketch(sketchBytes).getEstimate(item.asInstanceOf[UTF8String].toString)

  override def prettyName: String = "freq_estimate"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `freq_stream_length(sketch)` → how many values the sketch absorbed. */
case class FreqStreamLength(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(sketchBytes: Any): Any = FreqEval.sketch(sketchBytes).getStreamLength

  override def prettyName: String = "freq_stream_length"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `freq_max_error(sketch)` → the sketch's count-error bound; 0 means every
 * `freq_estimate`/`freq_items` count is exact (the map never purged). */
case class FreqMaxError(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(sketchBytes: Any): Any = FreqEval.sketch(sketchBytes).getMaximumError

  override def prettyName: String = "freq_max_error"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
