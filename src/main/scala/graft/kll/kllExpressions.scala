package graft.kll

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * KLL quantile sketches — the second mergeable-sketch family, proving the
 * library's sketch seam generalizes beyond cardinality (SURVEY.md §7.4 R7).
 * Same contract as the HLL operators: the sketch is a first-class
 * `BinaryType` column (Apache DataSketches KLL wire format — readable by
 * any DataSketches binding: Java, C++, Python, PostgreSQL), built per
 * group with map-side partials, re-aggregatable later with `kll_merge`,
 * queried with `kll_quantile` / `kll_rank` / `kll_n`.
 *
 * Accuracy: a KLL sketch with parameter `k` is EXACT while a group holds
 * at most `k` values (it retains them all) and approximates beyond that
 * with bounded rank error (~1.65/k at k=200). `kll_quantile` uses the
 * INCLUSIVE rank criterion — the smallest stored value whose cumulative
 * weight reaches `q*n` — which in exact mode coincides with SQL
 * `quantile_disc` semantics, making results engine-checkable.
 */
object KllDefaults {
  val K: Int = 200
}

sealed abstract class KllAgg extends TypedImperativeAggregate[Option[KllDoublesSketch]]
  with UnaryLike[Expression] {

  def k: Int

  // NOTE: no require() in the class body — Java deserialization on
  // executors reflectively invokes this superclass constructor before the
  // case-class fields are restored (k would read 0 and fail the check).
  // k is validated at analysis time instead.
  protected def checkK(): TypeCheckResult =
    if (k >= 8 && k <= 65535) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"kll k must be in [8, 65535], got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[KllDoublesSketch] = None

  protected def newSketch: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  override def merge(buffer: Option[KllDoublesSketch],
      other: Option[KllDoublesSketch]): Option[KllDoublesSketch] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.merge(b); Some(a)
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[KllDoublesSketch]): Any =
    buffer.map(_.toByteArray).orNull

  override def serialize(buffer: Option[KllDoublesSketch]): Array[Byte] =
    buffer.map(_.toByteArray).orNull

  // Convention (matches ThetaAgg.deserialize and KllMergeAgg.update): a
  // buffer that will RECEIVE merges is always a sketch this class
  // constructed via newSketch; heapified bytes are merged into one, never
  // used as the receiver directly. Keeps every merge() receiver writable
  // regardless of which DataSketches path produced the incoming bytes.
  override def deserialize(storageFormat: Array[Byte]): Option[KllDoublesSketch] =
    Option(storageFormat).map { b =>
      val sk = newSketch
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      sk
    }
}

/** `kll_init_agg(expr[, k])` → one binary KLL sketch per group over the
 * (double-cast) values; nulls skipped; empty group → null. */
case class KllInitAgg(
    child: Expression,
    k: Int = KllDefaults.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAgg with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base else checkK()
  }

  override def update(buffer: Option[KllDoublesSketch], input: InternalRow): Option[KllDoublesSketch] = {
    val value = child.eval(input)
    if (value == null) buffer
    else {
      val sk = buffer.getOrElse(newSketch)
      sk.update(value.asInstanceOf[Double])
      Some(sk)
    }
  }

  override def prettyName: String = "kll_init_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `kll_merge(sketch)` → union of previously materialized KLL sketches. */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllDefaults.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAgg {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => checkK()
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[KllDoublesSketch], input: InternalRow): Option[KllDoublesSketch] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val incoming = KllDoublesSketch.heapify(Memory.wrap(bytes))
        buffer match {
          case Some(a) => a.merge(incoming); Some(a)
          case None =>
            // merge into a fresh writable sketch — heapified compact
            // sketches are read-only receivers in some DataSketches paths
            val sk = newSketch
            sk.merge(incoming)
            Some(sk)
        }
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def prettyName: String = "kll_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[kll] object KllEval {
  def sketch(bytes: Any): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** `kll_quantile(sketch, q)` → the INCLUSIVE q-quantile (q in [0, 1]);
 * null sketch or empty sketch → null. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketchBytes: Any, q: Any): Any = {
    val sk = KllEval.sketch(sketchBytes)
    if (sk.isEmpty) null
    else sk.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override def prettyName: String = "kll_quantile"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, value)` → fraction of values <= value (INCLUSIVE);
 * empty sketch → null. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketchBytes: Any, v: Any): Any = {
    val sk = KllEval.sketch(sketchBytes)
    if (sk.isEmpty) null
    else sk.getRank(v.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override def prettyName: String = "kll_rank"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_cdf(sketch, splitPoints)` → INCLUSIVE cumulative distribution at
 * each of n ascending split points, plus a final 1.0 — array<double> of
 * length n+1. In exact mode each value is count(v <= sp)/n, a single IEEE
 * division, so results are engine-checkable bit-for-bit. Empty/null
 * sketch → null. */
case class KllCdf(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(sketchBytes: Any, splits: Any): Any = {
    val sk = KllEval.sketch(sketchBytes)
    if (sk.isEmpty) null
    else {
      val sp = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sk.getCDF(sp, QuantileSearchCriteria.INCLUSIVE))
    }
  }

  override def prettyName: String = "kll_cdf"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_pmf(sketch, splitPoints)` → probability mass between consecutive
 * split points (INCLUSIVE semantics, n+1 buckets for n points). Unlike
 * [[KllCdf]], masses are DIFFERENCES of rank fractions, so they carry
 * ±1 ulp floating-point error even in exact mode — use `kll_cdf` where
 * bit-exact cross-engine comparison matters. */
case class KllPmf(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(sketchBytes: Any, splits: Any): Any = {
    val sk = KllEval.sketch(sketchBytes)
    if (sk.isEmpty) null
    else {
      val sp = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sk.getPMF(sp, QuantileSearchCriteria.INCLUSIVE))
    }
  }

  override def prettyName: String = "kll_pmf"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)` → number of values the sketch has absorbed. */
case class KllCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(sketchBytes: Any): Any = KllEval.sketch(sketchBytes).getN

  override def prettyName: String = "kll_n"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
