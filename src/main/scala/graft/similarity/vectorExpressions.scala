package graft.similarity

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  /** Java source for the per-call combine; sees `a`, `b` (ArrayData), `n`
   * (min length) and must assign the result to `${ev}`. */
  protected def genLoop(ev: String, a: String, b: String): String

  protected def evalVectors(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(left: Any, right: Any): Any =
    evalVectors(left.asInstanceOf[ArrayData], right.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(ev.value.toString, a, b))
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

  override protected def genLoop(result: String, a: String, b: String): String =
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double acc = 0.0;
       |for (int i = 0; i < n; i++) {
       |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
       |}
       |$result = acc;
     """.stripMargin

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

  override protected def genLoop(result: String, a: String, b: String): String =
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$result = (na == 0.0 || nb == 0.0) ? 0.0 : dot / java.lang.Math.sqrt(na * nb);
     """.stripMargin

  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
