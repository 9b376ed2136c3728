package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: set Jaccard between two SORTED, DEDUPED
  * long arrays as one fused merge-walk — |a∩b| / |a∪b| without the two
  * hash-set builds `array_intersect` + `array_union` pay per pair
  * (each allocates and populates an OpenHashSet per call; the verify
  * stage of near-dup dedup evaluates millions of pairs). Empty∪empty
  * → 0.0, matching `size(array_intersect)/size(array_union)` = 0/0 →
  * NaN guarded by callers; here defined as 0.0 (no shared shingles).
  *
  * Callers sort+dedup ONCE at materialization (`array_sort` on the
  * hashed shingle array, reused across every pair of the join) — the
  * classic amortize-the-prep trade. Registered as `jaccard_sorted` via
  * GraftExtensions; second (b)-tier native expression after
  * [[CosineSim]].
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val uni = n + m - inter
    if (uni == 0) 0.0 else inter.toDouble / uni
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val uni = ctx.freshName("uni")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements(); int $m = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $uni = $n + $m - $inter;
         |${ev.value} = $uni == 0 ? 0.0 : (double) $inter / $uni;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
