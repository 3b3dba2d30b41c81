package graft.theta

import graft.hll.SketchHash
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Theta sketches — the third mergeable-sketch family: distinct counting
 * WITH SET ALGEBRA. Where HLL can only union (intersection falls back to
 * error-prone inclusion–exclusion, reference: HLLFunctions.scala:555-557),
 * theta sketches support union, intersection, and difference (A-and-not-B)
 * directly on the sketches, each yielding ANOTHER sketch that composes
 * further. Sketches travel as `BinaryType` columns in the DataSketches
 * compact-theta wire format (readable by any DataSketches binding).
 *
 * Values are fed through the library's type-tagged xxHash64
 * ([[graft.hll.SketchHash]]) so the null/empty/container semantics matrix
 * matches the HLL family exactly.
 *
 * Accuracy: exact while the number of distinct values stays under the
 * nominal entries (2^lgK, default 4096); beyond that, a random sample of
 * ~2^lgK hashes with relative error ~1/sqrt(2^lgK).
 */
object ThetaDefaults {
  val LgK: Int = 12
}

sealed abstract class ThetaAgg extends TypedImperativeAggregate[Option[Union]]
  with UnaryLike[Expression] {

  def lgK: Int

  // Validated at analysis time, NOT in the class body: Java deserialization
  // on executors runs this constructor before case-class fields restore.
  protected def checkLgK(): TypeCheckResult =
    if (lgK >= 4 && lgK <= 26) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"theta lgK must be in [4, 26], got $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  protected def newUnion: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Option[Union] = None

  override def merge(buffer: Option[Union], other: Option[Union]): Option[Union] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.union(b.getResult(false, null)); Some(a)
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[Union]): Any =
    buffer.map(_.getResult(true, null).toByteArray).orNull

  override def serialize(buffer: Option[Union]): Array[Byte] =
    buffer.map(_.getResult(true, null).toByteArray).orNull

  override def deserialize(storageFormat: Array[Byte]): Option[Union] =
    Option(storageFormat).map { bytes =>
      val u = newUnion
      u.union(Memory.wrap(bytes))
      u
    }
}

/** `theta_init_agg(expr[, lgK])` → one compact theta sketch per group;
 * nulls skipped; empty group → null. Accepts any input type (type-tagged
 * hashing, like hll_init_agg). */
case class ThetaInitAgg(
    child: Expression,
    lgK: Int = ThetaDefaults.LgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAgg {

  override def checkInputDataTypes(): TypeCheckResult = checkLgK()

  override def update(buffer: Option[Union], input: InternalRow): Option[Union] = {
    val value = child.eval(input)
    if (value == null) buffer
    else {
      val u = buffer.getOrElse(newUnion)
      u.update(SketchHash.hashValue(value, child.dataType))
      Some(u)
    }
  }

  override def prettyName: String = "theta_init_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaInitAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaInitAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `theta_union(sketch[, lgK])` → union of previously built sketches. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = ThetaDefaults.LgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAgg {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => checkLgK()
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[Union], input: InternalRow): Option[Union] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val u = buffer.getOrElse(newUnion)
        u.union(Memory.wrap(bytes))
        Some(u)
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def prettyName: String = "theta_union"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused `theta_estimate(theta_union(...))`: identical union state to
 * [[ThetaUnionAgg]], but eval estimates off the live union instead of
 * compacting to ordered bytes that `theta_estimate` immediately re-wraps.
 * Same running-window motivation as the HLL fusion (see
 * `graft.hll.FuseWindowSketchEval`, which introduces this when the plan
 * proves the sketch bytes are never observed): compaction sorts and
 * copies the retained-hash array at EVERY row of an expanding frame. The
 * estimate is identical — it depends only on the retained hashes and
 * theta, not on compact ordering. Not exposed as a user function. */
case class ThetaUnionCountAgg(
    child: Expression,
    lgK: Int = ThetaDefaults.LgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAgg {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => checkLgK()
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[Union], input: InternalRow): Option[Union] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        val u = buffer.getOrElse(newUnion)
        u.union(Memory.wrap(bytes))
        Some(u)
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def eval(buffer: Option[Union]): Any =
    buffer.map(u => Long.box(Math.round(u.getResult(false, null).getEstimate))).orNull

  override def prettyName: String = "theta_union_count"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[theta] object ThetaEval {
  def sketch(bytes: Any): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** `theta_intersect(a, b)` → sketch of A ∩ B. Null if either side null. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaEval.sketch(a))
    i.intersect(ThetaEval.sketch(b))
    i.getResult(true, null).toByteArray
  }

  override def prettyName: String = "theta_intersect"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_a_not_b(a, b)` → sketch of A \ B. Null if either side null. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(ThetaEval.sketch(a), ThetaEval.sketch(b)).toByteArray
  }

  override def prettyName: String = "theta_a_not_b"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_estimate(sketch)` → estimated distinct count, rounded to long
 * (exact — a whole number — while the sketch is in exact mode). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(bytes: Any): Any =
    Math.round(ThetaEval.sketch(bytes).getEstimate)

  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
