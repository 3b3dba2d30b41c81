package graft.similarity

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/**
 * Whole-stage-codegen'd vector kernels over `array<float>` columns.
 *
 * Embedding similarity is the one place where Spark's built-in tools are
 * structurally too slow for 100 TB: `zip_with` + `aggregate` higher-order
 * functions allocate arrays and evaluate interpreted lambdas per element —
 * two orders of magnitude over a fused loop. These expressions generate a
 * tight primitive loop inside WholeStageCodegen instead, so a brute-force
 * scoring pass is compute-bound, not allocation-bound.
 */
abstract class FloatVectorBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Java source for the per-call combine; sees `a`, `b` (ArrayData) and
   * must assign the result to `${ev}`. Local variable names MUST come from
   * `ctx.freshName` — with non-nullable inputs the generated snippet is
   * inlined into the surrounding scope without braces, so two calls in one
   * projection would otherwise declare duplicate Java locals and knock the
   * whole stage out of codegen. */
  protected def genLoop(ctx: CodegenContext, ev: String, a: String, b: String): String

  protected def evalVectors(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(left: Any, right: Any): Any =
    evalVectors(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(ctx, ev.value.toString, a, b))
}

/** `dot(a, b)` — inner product in double precision, sequential order. */
case class ArrayDotProduct(left: Expression, right: Expression) extends FloatVectorBinaryOp {

  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def genLoop(ctx: CodegenContext, result: String, a: String, b: String): String = {
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
       |$result = $acc;
     """.stripMargin
  }

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `cosine(a, b)` — cosine similarity in double precision; 0.0 when either
 * vector has zero norm (instead of NaN, so downstream filters stay sane). */
case class ArrayCosineSimilarity(left: Expression, right: Expression) extends FloatVectorBinaryOp {

  override protected def evalVectors(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def genLoop(ctx: CodegenContext, result: String, a: String, b: String): String = {
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double x = (double) $a.getFloat($i);
       |  double y = (double) $b.getFloat($i);
       |  $dot += x * y; $na += x * x; $nb += y * y;
       |}
       |$result = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
     """.stripMargin
  }

  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * `quantize_int8(vec)` → struct<scale: double, q: array<tinyint>> —
 * symmetric absmax int8 quantization: `scale = max(|x|)/127`,
 * `q_i = floor(x_i/scale + 0.5)` clamped to [-127, 127] (an all-zero
 * vector quantizes to scale 0, all-zero codes).
 *
 * Why it exists at 100 TB: a float32 embedding column is usually the
 * widest thing in a training-data table; int8 codes cut its scan, shuffle,
 * and cache footprint 4× while keeping ANN ranking quality (the standard
 * absmax scheme). Pairs with [[Int8DotProduct]]: integer dots rescale to
 * approximate float dots via `scale_a · scale_b`.
 *
 * Every arithmetic step is IEEE-double exact — float widening, one
 * division, floor(x+0.5) — so codes are reproducible bit-for-bit by any
 * engine with doubles (the q32 oracle recomputes them in DuckDB SQL;
 * explicit floor(x+0.5) rather than round() because engines disagree on
 * round-half for negatives).
 */
case class QuantizeInt8(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > amax) amax = x
      i += 1
    }
    val q = new Array[Byte](n)
    val scale = if (amax == 0.0) 0.0 else amax / 127.0
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val r = Math.floor(v.getFloat(i).toDouble / scale + 0.5)
        q(i) = Math.max(-127.0, Math.min(127.0, r)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }

  override def prettyName: String = "quantize_int8"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `int8_dot(qa, qb)` — integer inner product of two int8 code arrays, as
 * a long. Exact integer arithmetic: the same codes give the same dot on
 * every engine, which is what lets a quantized ANN ranking be
 * oracle-checked value-for-value. Rescale with `scale_a * scale_b` to
 * approximate the float dot. Codegen'd — this is the hot loop of a
 * quantized scoring pass. */
case class Int8DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: with non-nullable inputs this snippet inlines unbraced
      // into the surrounding scope; fixed names would collide across calls.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override def prettyName: String = "int8_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
