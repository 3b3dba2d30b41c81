package graft.hll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * Catalyst expressions for re-aggregatable HyperLogLog sketches.
 *
 * Nine operators, semantics matching the reference library operator-for-
 * operator (reference: alchemy/src/main/scala/com/swoop/alchemy/spark/
 * expressions/hll/HLLFunctions.scala; SURVEY.md §2.1), re-expressed on
 * Spark 4 catalyst.
 *
 * Scale design: all aggregates are [[TypedImperativeAggregate]]s, so Spark
 * plans them as ObjectHashAggregate with a partial (map-side) phase — the
 * shuffle carries at most one ~2^p-register sketch per group per task
 * instead of raw rows. That map-side collapse is the entire 100-TB story for
 * distinct counting: shuffle volume is bounded by |groups| × sketch size,
 * independent of input row count.
 *
 * Null-semantics matrix (verified by GraftHllSpec, identical to the
 * reference, SURVEY.md §2.1 footnote):
 *   - scalar init: null in → null out; empty collection → empty sketch.
 *   - agg init: nulls skipped; empty/all-null group → null.
 *   - merge: null sketches skipped; all-null group → null.
 *   - row_merge: null args skipped; all-null row → null.
 *   - cardinality: null → null.
 *   - intersect: both null → null; exactly one null → 0.
 */
object Precision {
  /** Same precision derivation as Spark's own HyperLogLogPlusPlus (and the
   * reference, HLLFunctions.scala:67-70): p = ceil(2·log2(1.106/sd)). */
  def forError(relativeSD: Double): Int = {
    val p = math.ceil(2.0d * math.log(1.106d / relativeSD) / math.log(2.0d)).toInt
    require(p >= 4,
      "HLL requires at least 4 bits for addressing. Use a lower error, at most 39%.")
    p
  }
}

/** Anything carrying a resolved sketch wire format. */
trait HasHllFormat {
  def format: HllFormat
}

/** Shared value-ingestion logic for the four init operators. */
sealed trait SketchIngest extends HasHllFormat {
  def child: Expression
  def relativeSD: Double

  protected val precision: Int = Precision.forError(relativeSD)

  protected def newSketch: HllInstance = format.create(precision)

  /** Fold one input value into the sketch. */
  def ingest(value: Any, sketch: HllInstance): HllInstance
}

/** Treat the whole value (including arrays/maps/structs) as one atom. */
trait IngestAtom extends SketchIngest {
  override def ingest(value: Any, sketch: HllInstance): HllInstance =
    sketch.offer(SketchHash.hashValue(value, child.dataType))
}

/** Treat the value as a collection and ingest its members individually:
 * array elements on their own (nulls skipped), map entries as
 * key-chained-into-value hashes (reference: HLLFunctions.scala:95-124). */
trait IngestCollection extends SketchIngest { self: Expression =>

  def checkCollectionInput(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: NullType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports array and map input.")
  }

  override def ingest(value: Any, sketch: HllInstance): HllInstance = {
    value match {
      case arr: ArrayData =>
        val ArrayType(et, _) = child.dataType: @unchecked
        arr.foreach(et, (_, element) => {
          if (element != null) sketch.offer(SketchHash.hashValue(element, et))
        })
      case map: MapData =>
        val MapType(kt, vt, _) = child.dataType: @unchecked
        map.foreach(kt, vt, (k, v) => {
          // Chain the key hash into the value hash so {a->1} ≠ {a->2} ≠ {b->1}.
          sketch.offer(SketchHash.hash(v, vt, SketchHash.hashValue(k, kt)))
        })
      case null => // NullType literal: nothing to ingest
      case other =>
        throw new UnsupportedOperationException(
          s"$prettyName only supports array and map input, got: ${other.getClass.getName}")
    }
    sketch
  }
}

/** Scalar init: one sketch per row; null in → null out. */
sealed abstract class ScalarInit extends UnaryExpression with SketchIngest with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(value: Any): Any = ingest(value, newSketch).serialize
}

/** Aggregate buffer plumbing shared by the three sketch aggregates.
 *
 * The buffer is `Option[HllInstance]` — `None` until the first non-null
 * input — and crosses task/shuffle boundaries only through our own
 * serialize/deserialize (never Java serialization; SURVEY.md §7.4 R6). */
sealed abstract class SketchAgg extends TypedImperativeAggregate[Option[HllInstance]]
  with UnaryLike[Expression] with HasHllFormat {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[HllInstance] = None

  override def merge(buffer: Option[HllInstance], other: Option[HllInstance]): Option[HllInstance] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(a.merge(b))
      case (None, b) => b
      case (a, None) => a
    }

  override def eval(buffer: Option[HllInstance]): Any = buffer.map(_.serialize).orNull

  override def serialize(buffer: Option[HllInstance]): Array[Byte] =
    buffer.map(_.serialize).orNull

  override def deserialize(storageFormat: Array[Byte]): Option[HllInstance] =
    Option(storageFormat).map {
      // A deserialized buffer is adopted as the MUTABLE merge target, so
      // STRM takes the lean dense parse in its privately-owned form
      // (never the shared cache) — this is the per-partial constant of
      // the final-aggregation side of every sketch exchange.
      case bytes if format == StreamLibHll => StreamLibHll.deserializeFast(bytes)
      case bytes => format.deserialize(bytes)
    }

  /** Fold one serialized incoming sketch into the buffer. Merge-only
   * consumers never observe the instance type, so the STRM format takes the
   * lean dense parse ([[FastStrmInstance]]) — same registers, same
   * estimator, none of the per-row Builder allocation that dominates
   * windowed merges. The merge ARGUMENT may be a shared cached instance
   * (read-only in every merge implementation); adoption as the mutable
   * buffer always gets a privately-owned parse. */
  protected final def mergeIncoming(
      buffer: Option[HllInstance], bytes: Array[Byte]): Option[HllInstance] = buffer match {
    case Some(b) =>
      val shared = format match {
        case StreamLibHll => StreamLibHll.deserializeFastShared(bytes)
        case other => other.deserialize(bytes)
      }
      Some(b.merge(shared))
    case None =>
      val owned = format match {
        case StreamLibHll => StreamLibHll.deserializeFast(bytes)
        case other => other.deserialize(bytes)
      }
      Some(owned)
  }
}

/** Aggregate init: one sketch per group; nulls skipped; empty group → null. */
sealed abstract class AggInit extends SketchAgg with SketchIngest {
  override def update(buffer: Option[HllInstance], input: InternalRow): Option[HllInstance] = {
    val value = child.eval(input)
    if (value == null) buffer
    else Some(ingest(value, buffer.getOrElse(newSketch)))
  }
}

// --------------------------- the nine operators ----------------------------

/** `hll_init(expr[, relativeSD[, implName]])` → binary sketch per row. */
case class HllInitSimple(
    child: Expression,
    relativeSD: Double = 0.05,
    format: HllFormat = HllFormat.resolve(null))
  extends ScalarInit with IngestAtom {
  override def prettyName: String = "hll_init"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_init_collection(arrayOrMap[, relativeSD[, implName]])` → binary sketch per row. */
case class HllInitCollection(
    child: Expression,
    relativeSD: Double = 0.05,
    format: HllFormat = HllFormat.resolve(null))
  extends ScalarInit with IngestCollection {
  override def checkInputDataTypes(): TypeCheckResult = checkCollectionInput()
  override def prettyName: String = "hll_init_collection"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_init_agg(expr[, relativeSD[, implName]])` → one binary sketch per group. */
case class HllInitSimpleAgg(
    child: Expression,
    relativeSD: Double = 0.05,
    format: HllFormat = HllFormat.resolve(null),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends AggInit with IngestAtom {
  override def prettyName: String = "hll_init_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllInitSimpleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllInitSimpleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_init_collection_agg(arrayOrMap[, relativeSD[, implName]])` → one sketch per group. */
case class HllInitCollectionAgg(
    child: Expression,
    relativeSD: Double = 0.05,
    format: HllFormat = HllFormat.resolve(null),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends AggInit with IngestCollection {
  override def checkInputDataTypes(): TypeCheckResult = checkCollectionInput()
  override def prettyName: String = "hll_init_collection_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllInitCollectionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllInitCollectionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_merge(sketch[, implName])` — the re-aggregation operator: unions
 * previously materialized sketches per group. */
case class HllMerge(
    child: Expression,
    format: HllFormat = HllFormat.resolve(null),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SketchAgg {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[HllInstance], input: InternalRow): Option[HllInstance] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        mergeIncoming(buffer, bytes)
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def prettyName: String = "hll_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused `hll_cardinality(hll_merge(...))`: identical union state to
 * [[HllMerge]], but `eval` estimates straight off the live buffer instead
 * of serializing it — so a consumer that only wants the NUMBER never pays
 * serialize+deserialize per output. That cost is invisible in a normal
 * aggregation (one eval per group) but is the dominant constant in a
 * RUNNING window, where eval fires per ROW: the cumulative-distinct frame
 * re-serializes and re-parses the whole sketch at every step. Not exposed
 * as a user function — [[FuseWindowSketchEval]] introduces it when the
 * plan proves the sketch bytes are never observed. */
case class HllMergeCardinality(
    child: Expression,
    format: HllFormat = HllFormat.resolve(null),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SketchAgg {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName only supports binary input")
  }

  override def update(buffer: Option[HllInstance], input: InternalRow): Option[HllInstance] =
    child.eval(input) match {
      case null => buffer
      case bytes: Array[Byte] =>
        mergeIncoming(buffer, bytes)
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
    }

  override def eval(buffer: Option[HllInstance]): Any =
    buffer.map(_.cardinality).map(Long.box).orNull

  override def prettyName: String = "hll_merge_cardinality"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeCardinality =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeCardinality =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_row_merge(sketch1, ..., sketchN[, implName])` — scalar union of N
 * sketch columns within a row. Null arguments are skipped; all-null → null. */
case class HllRowMerge(
    children: Seq[Expression],
    format: HllFormat = HllFormat.resolve(null))
  extends Expression with ExpectsInputTypes with CodegenFallback with HasHllFormat {

  require(children.nonEmpty, s"$prettyName requires at least one argument.")

  override def inputTypes: Seq[DataType] = Seq.fill(children.size)(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.forall(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    var acc: HllInstance = null
    children.foreach { c =>
      c.eval(input) match {
        case null =>
        case bytes: Array[Byte] =>
          val sk = format.deserialize(bytes)
          acc = if (acc == null) sk else acc.merge(sk)
        case other =>
          throw new IllegalStateException(s"$prettyName only supports Array[Byte], got $other")
      }
    }
    if (acc == null) null else acc.serialize
  }

  override def prettyName: String = "hll_row_merge"
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `hll_cardinality(sketch[, implName])` → bigint estimate; null → null. */
case class HllCardinality(
    child: Expression,
    format: HllFormat = HllFormat.resolve(null))
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback with HasHllFormat {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    format.deserialize(input.asInstanceOf[Array[Byte]]).cardinality

  override def prettyName: String = "hll_cardinality"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_intersect_cardinality(sketchL, sketchR[, implName])` → bigint via
 * inclusion–exclusion `max(|A|+|B|-|A∪B|, 0)`. Both null → null; exactly one
 * null → 0. Error tracks the constituent sketch cardinalities, not the
 * intersection size. */
case class HllIntersectCardinality(
    left: Expression,
    right: Expression,
    format: HllFormat = HllFormat.resolve(null))
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback with HasHllFormat {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) null
    else if (l == null || r == null) 0L
    else {
      val a = format.deserialize(l.asInstanceOf[Array[Byte]])
      val b = format.deserialize(r.asInstanceOf[Array[Byte]])
      val cardA = a.cardinality
      val cardB = b.cardinality
      val cardUnion = a.merge(b).cardinality
      math.max(cardA + cardB - cardUnion, 0L)
    }
  }

  override def prettyName: String = "hll_intersect_cardinality"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hll_convert(sketch, implNameFrom, implNameTo)` — byte-level transcoding
 * between wire formats without recomputation. Supported: STRM → GRAFT.
 *
 * Converted sketches must NOT be merged with natively-built sketches of the
 * target format: formats consume different parts of the hash, so a native
 * GRAFT sketch and a converted one disagree register-by-register. */
case class HllConvert(
    child: Expression,
    from: HllFormat,
    to: HllFormat)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = (from, to) match {
    case (StreamLibHll, GraftHll) => SketchConvert.strmToGraft(input.asInstanceOf[Array[Byte]])
    case _ => throw new IllegalArgumentException(
      s"HLL conversion is currently only supported from STRM/STREAM_LIB to GRAFT " +
        s"(requested: ${from.name} to ${to.name})")
  }

  override def prettyName: String = "hll_convert"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_init_hashed_agg(hash64[, relativeSD[, implName]])` — one sketch per
 * group from PRE-HASHED 64-bit values: each non-null long is offered to the
 * sketch as-is, bypassing [[SketchHash]].
 *
 * This is the bring-your-own-hash seam for cross-engine pipelines: any
 * system that can produce the same 64-bit hash (e.g. the first 8 bytes of
 * `md5()`, computable in DuckDB/Postgres/Trino as much as in Spark via
 * `md5_hash64`) can build, merge, or independently re-derive the very same
 * registers. The caller owns hash quality — a biased hash gives a biased
 * estimate. */
case class HllInitHashedAgg(
    child: Expression,
    relativeSD: Double = 0.05,
    format: HllFormat = HllFormat.resolve(null),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SketchAgg {

  private val precision: Int = Precision.forError(relativeSD)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName only supports pre-hashed BIGINT input")
  }

  override def update(buffer: Option[HllInstance], input: InternalRow): Option[HllInstance] =
    child.eval(input) match {
      case null => buffer
      case h: Long => Some(buffer.getOrElse(format.create(precision)).offer(h))
      case other =>
        throw new IllegalStateException(s"$prettyName only supports Long, got $other")
    }

  override def prettyName: String = "hll_init_hashed_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): HllInitHashedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllInitHashedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_registers(graftSketch)` → array<int>: the dense HLL register values
 * of a GRAFT v1 sketch, in index order (2^p elements).
 *
 * The point of the GRAFT format is that its bytes are readable OUTSIDE this
 * library (header 'G', version, p, then one byte per register — see
 * [[GraftHllInstance.serialize]]); this expression is the in-Spark decoder,
 * and the harness pairs it with a pure-SQL DuckDB decoder of the same rows
 * to prove the claim engine-independently. */
case class HllRegisters(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val g = GraftHll.deserialize(input.asInstanceOf[Array[Byte]])
      .asInstanceOf[GraftHllInstance]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      g.registers.map(r => (r.toInt): Any))
  }

  override def prettyName: String = "hll_registers"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
