package graft.sources

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `hilbert2(x, y)` — distance along the 2-D Hilbert curve of order `bits`
 * for a pre-quantized grid cell (the classic bit-twiddling xy→d walk —
 * Hilbert 1891; the public-domain per-level rotate/reflect formulation).
 *
 * The layout companion to [[Layout.zorder2]]: both linearize a 2-D grid so
 * range-partitioned files carry tight min/max spans on BOTH columns, but
 * the Hilbert curve never makes Morton's long diagonal jumps — EVERY
 * consecutive pair of curve positions is grid-adjacent (|Δx|+|Δy| = 1,
 * pinned exhaustively in LayoutSpec), so a file covering a curve range
 * covers a tighter spatial blob and min/max pruning discards more files
 * for the same predicate. The price is this non-trivial per-row kernel
 * versus Morton's four mask-shifts — pure long arithmetic either way:
 * whole-stage-codegen'd here, and re-derived level-by-level in the
 * DuckDB oracle (q128).
 *
 * Per level s (high bit first): quadrant = (3·rx) xor ry contributes
 * s²·quadrant steps, then the lower bits rotate/reflect into the
 * quadrant's frame (ry=0: reflect both axes when rx=1, then swap).
 */
case class Hilbert2(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def nullSafeEval(xv: Any, yv: Any): Any = {
    var x = xv.asInstanceOf[Long]
    var y = yv.asInstanceOf[Long]
    val n1 = (1L << bits) - 1L
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xg, yg) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val n1 = (1L << bits) - 1L
      s"""
         |long $x = $xg; long $y = $yg; long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n1}L - $x; $y = ${n1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
