package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the k-permutation MinHash signature of a
  * hashed-shingle array in ONE traversal.
  *
  *   minhash_sigs(hs, k)[i] = min over h∈hs of (h·(2i+3) + (5i+7)) mod 1e9+7
  *
  * — bit-identical to the mirrored-pipeline lambda form
  * `transform(sequence(0, k-1), i -> array_min(transform(hs, ...)))`
  * and to the DuckDB oracle's `list_transform(range(0, k), i ->
  * list_min(list_transform(hs, ...)))`, but one pass instead of k:
  * the lambda chain allocates k intermediate n-element arrays per row
  * and walks the shingle array k times; this keeps k running minima in
  * a local array and walks once. The signature build is the map-side
  * cost of every banding stage in the mirrored dedup family
  * (p40/p60/p62). Empty input yields NULL (the lambda form yields an
  * all-null signature; both produce zero band candidates — callers
  * filter size ≥ 3 before signing, pinned in MinhashSigsSpec).
  *
  * Fourth native expression (CosineSim, JaccardSorted, PolyHash) —
  * the same SparkSessionExtensions answer to the reference's plugin
  * hook (reference README.md:34-57).
  */
case class MinhashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(hs: Any, k: Any): Any =
    MinhashSigs.compute(hs.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, k) => {
      s"""
         |${ev.value} = graft.functions.MinhashSigs.compute($hs, (int) $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSigs =
    copy(left = newLeft, right = newRight)
}

object MinhashSigs {
  private final val P = 1000000007L

  /** One pass over the shingle hashes, k running minima. */
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * (2L * i + 3L) + (5L * i + 7L)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
