package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF" row): element-wise
  * mean of double vectors — the centroid computation an IVF coarse
  * quantizer trains with (one k-means Lloyd step is exactly
  * groupBy(cell).agg(vector_centroid(v))).
  *
  * Implemented as `Aggregator[IN, BUF, OUT]` registered through
  * `functions.udaf`, the supported typed-aggregation extension point.
  * The buffer is (running sums, count) so partial aggregation (map-side
  * combine) works — merge is associative, which is what keeps the
  * shuffle tiny at scale: executors ship one (sums, count) pair per
  * group, not the vectors. Built-ins are still preferred where they fit
  * (this is expressible as avg over posexploded pairs — at the cost of a
  * dim× row blowup through the shuffle; the Aggregator avoids that).
  */
object VectorCentroid
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long),
                      v: Array[Double]): (Array[Double], Long) = {
    if (v == null) b
    else if (b._2 == 0L) (v.clone(), 1L)
    else {
      var i = 0
      while (i < b._1.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long),
                     b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) null
    else r._1.map(_ / r._2)

  private def arrEnc: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(arrEnc, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = arrEnc
}
