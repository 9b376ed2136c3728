package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature for the xxhash64 FAST PATH (the
  * production banding family: p05/s08's seeded-rehash permutations,
  * where [[MinhashSigs]] serves the DuckDB-mirrorable linear
  * permutations):
  *
  *   xx_minhash_sigs(hs, k)[i] = min over h∈hs of
  *                               xxhash64-chain(h, i)   (seed 42)
  *
  * — bit-identical to `transform(sequence(...), i -> array_min(
  * transform(hs, x -> xxhash64(x, i))))`, Spark's multi-arg xxhash64
  * being the fold `hashLong(i, hashLong(h, 42))`, but ONE traversal
  * with k running minima instead of k transform+array_min passes each
  * allocating an n-element array per row (the map-side cost of the
  * per-row banding the streaming dedup runs on every arriving doc).
  * Empty input yields NULL, which downstream band building treats the
  * same as the lambda's all-null signature (concat_ws skips nulls —
  * pinned in XxMinhashSigsSpec).
  */
case class XxMinhashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(hs: Any, k: Any): Any =
    XxMinhashSigs.compute(hs.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, k) => {
      s"""
         |${ev.value} = graft.functions.XxMinhashSigs.compute($hs, (int) $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxMinhashSigs =
    copy(left = newLeft, right = newRight)
}

object XxMinhashSigs {
  /** One traversal, k running minima of the seeded xxhash64 chain. */
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      // Spark's xxhash64(x, i) folds children left-to-right from seed
      // 42: hashInt(i, hashLong(x, 42)) — i is an INT literal in the
      // lambda form, so the seed step is hashInt, and the inner hash
      // is loop-invariant per element (the lambda recomputes it k
      // times; hoisted here)
      val inner = XXH64.hashLong(hs.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, inner)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
