package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Whole-operator Catalyst extension (the (c) tier beyond native
  * expressions): brute-force cosine top-k as ONE narrow pass over the
  * corpus instead of the declarative crossJoin × window formulation.
  *
  * The composed plan (p09) materializes |corpus|·|queries| joined rows
  * and shuffles them into a rank window; this operator holds a bounded
  * k-heap per query per partition while streaming the corpus ONCE,
  * then merges the ≤ partitions·q·k survivors by key — at 100 TB the
  * shuffle carries kilobytes, not the cross product. Determinism
  * matches p09 exactly: cosine accumulates left-to-right (CosineSim's
  * loop), rounds to micro units, ranks by (cos desc, id asc) — so the
  * SAME DuckDB oracle hash-checks both plans.
  *
  * Wiring: `CosineTopKPlan` (logical, fixed output) is planned by
  * `CosineTopKStrategy` (injected via
  * `SparkSessionExtensions.injectPlannerStrategy`) into
  * `CosineTopKExec`. `CosineTopK.topK` builds the DataFrame through
  * `classic.Dataset.ofRows`.
  */
case class CosineTopKPlan(
    queries: Seq[(Long, Seq[Double])],
    k: Int,
    excludeSelf: Boolean,
    // output attrs are a constructor FIELD, not a generated val —
    // Catalyst copies nodes freely during optimization, and fresh
    // exprIds on copy would orphan every downstream reference
    output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  // we consume every child column (id, vector) — declaring the full
  // child output as referenced keeps ColumnPruning honest about it
  override def references: AttributeSet = child.outputSet
  // the output attrs originate HERE (they ride the constructor, which
  // QueryPlan would otherwise scan into references → phantom
  // missingInput)
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: LogicalPlan): CosineTopKPlan =
    copy(child = c)
}

class CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CosineTopKPlan(queries, k, excludeSelf, out, child) =>
      CosineTopKExec(queries, k, excludeSelf, out,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class CosineTopKExec(
    queries: Seq[(Long, Seq[Double])],
    k: Int,
    excludeSelf: Boolean,
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildInternal(c: SparkPlan): CosineTopKExec =
    copy(child = c)

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val exclSelf = excludeSelf
    // pre-normalize the (broadcast-sized) query side once
    val qs = queries.map { case (qid, v) =>
      val arr = v.toArray
      var nq = 0.0
      var i = 0
      while (i < arr.length) { nq += arr(i) * arr(i); i += 1 }
      (qid, arr, math.sqrt(nq))
    }.toArray
    val bc = sparkContext.broadcast(qs)

    // heap entries (id, cosMicro); "worst" = smaller cos, then larger
    // id — it compares GREATEST (PriorityQueue dequeues the max), so
    // an ASCENDING sorted(worstFirst) is best-first
    val worstFirst = new Ordering[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }

    val partials: RDD[(Long, Array[(Long, Long)])] =
      child.execute().mapPartitions { iter =>
        val q = bc.value
        val heaps = q.map(_ =>
          new scala.collection.mutable.PriorityQueue[(Long, Long)]()(
            worstFirst))
        iter.foreach { row =>
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val id = row.getLong(0)
            val v = row.getArray(1).toDoubleArray()
            // per-row norm computed once, shared by every query
            var nv = 0.0
            var i = 0
            while (i < v.length) { nv += v(i) * v(i); i += 1 }
            nv = math.sqrt(nv)
            var j = 0
            while (j < q.length) {
              val (qid, qv, nq) = q(j)
              if (!(exclSelf && id == qid)) {
                val n = math.min(qv.length, v.length)
                var dot = 0.0
                var t = 0
                while (t < n) { dot += qv(t) * v(t); t += 1 }
                // identical determinization to p09: micro-rounded cos
                val micro = math.floor(dot / (nq * nv) * 1000000 + 0.5).toLong
                val h = heaps(j)
                if (h.size < kLocal) h.enqueue((id, micro))
                else if (worstFirst.compare((id, micro), h.head) < 0) {
                  h.dequeue(); h.enqueue((id, micro))
                }
              }
              j += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.filter(_._1.nonEmpty).map {
          case (h, j) => (q(j)._1, h.toArray)
        }
      }

    partials
      .reduceByKey { (a, b) =>
        // merge two bounded heaps: best-first sort, keep best k
        (a ++ b).sorted(worstFirst).take(kLocal)
      }
      .mapPartitions { it =>
        // downstream operators consume UnsafeRow — project per partition
        val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(Array(LongType, IntegerType, LongType,
            DoubleType): Array[org.apache.spark.sql.types.DataType])
        it.flatMap { case (qid, top) =>
          top.sorted(worstFirst).iterator.zipWithIndex.map {
            case ((id, micro), idx) =>
              proj(new GenericInternalRow(Array[Any](
                qid, idx + 1, id, micro / 1e6))).copy(): InternalRow
          }
        }
      }
  }
}

object CosineTopK {
  private[plans] def outputAttrs: Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)(),
    AttributeReference("n_id", LongType, nullable = false)(),
    AttributeReference("cos_r", DoubleType, nullable = false)())

  /** Top-k cosine neighbours of each query vector over `corpus`
    * (columns: long id, array&lt;double&gt; vector — projected/cast
    * here). Returns [q_id, rank, n_id, cos_r]. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: Seq[(Long, Seq[Double])], k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val proj = corpus.select(col(idCol).cast("long"),
      col(vecCol).cast(ArrayType(DoubleType)))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(corpus.sparkSession,
      CosineTopKPlan(queries, k, excludeSelf, outputAttrs,
        proj.queryExecution.analyzed))
  }
}
