package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The whole-operator extension: CosineTopKPlan → strategy →
  * CosineTopKExec. The load-bearing pins are (1) row-for-row equality
  * with the composed crossJoin×window plan (p09) and (2) that equality
  * HOLDING under a many-partition corpus — the heap-merge path a
  * single-file read never exercises. */
class CosineTopKSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def corpus = {
    import graft.llm.VectorOps
    graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
  }

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.where(col("vec_id") < 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

  // the probe-side BroadcastExchange makes AQE wrap the plan, and both
  // AdaptiveSparkPlanExec and QueryStageExec hide their inner plan from
  // collect() (leaf-like) — recurse through them explicitly
  private def findTopK(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[CosineTopKExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan match {
      case a: AdaptiveSparkPlanExec => findTopK(a.executedPlan)
      case q: QueryStageExec => findTopK(q.plan)
      case e: CosineTopKExec => Seq(e)
      case p => p.children.flatMap(findTopK)
    }
  }

  test("plan contains CosineTopKExec, no join, no window") {
    val df = CosineTopK.topK(corpus, "vec_id", "v", queriesOf(corpus), 5,
      excludeSelf = true)
    val exec = df.queryExecution.executedPlan
    assert(findTopK(exec).nonEmpty,
      s"strategy did not fire:\n$exec")
    val plan = exec.toString
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"operator plan regrew the composed shape:\n$plan")
  }

  test("row-for-row equal to the composed p09 plan, incl many partitions") {
    val composed = graft.SparkEntry.queries("p09_ann_topk")(spark, sfDir)
      .collect().toSeq
    def run(parts: Int): Seq[Row] = {
      val c = if (parts == 0) corpus else corpus.repartition(parts)
      CosineTopK.topK(c, "vec_id", "v", queriesOf(corpus), 5,
        excludeSelf = true).orderBy("q_id", "rank").collect().toSeq
    }
    assert(run(0) == composed, "single-partition mismatch")
    // 17 partitions of ~6 rows each: every per-partition heap is
    // partial, so the reduceByKey merge decides the answer
    assert(run(17) == composed, "heap-merge path diverged")
  }

  test("DataFrame probe side: broadcast exchange, never a shuffle") {
    // the probe side is a CHILD PLAN (non-literal); EnsureRequirements
    // must satisfy its BroadcastDistribution with a BroadcastExchange —
    // and nothing on the probe path may shuffle
    val df = CosineTopK.topK(corpus, "vec_id", "v",
      corpus.where(col("vec_id") < 3), "vec_id", "v", 5,
      excludeSelf = true)
    df.collect() // materialize through AQE so the final plan is real
    val exec = df.queryExecution.executedPlan
    val topk = findTopK(exec)
    assert(topk.nonEmpty, s"strategy did not fire:\n$exec")
    val probeSide = topk.head.right.toString
    assert(probeSide.contains("BroadcastExchange") ||
      probeSide.contains("BroadcastQueryStage"),
      s"probe side is not broadcast:\n$probeSide")
    assert(!probeSide.contains("ShuffleExchange") &&
      !probeSide.contains("Exchange hashpartitioning"),
      s"probe side shuffled:\n$probeSide")
    // row-for-row equal to the literal-probe form
    val lit = CosineTopK.topK(corpus, "vec_id", "v", queriesOf(corpus), 5,
      excludeSelf = true).orderBy("q_id", "rank").collect().toSeq
    assert(df.orderBy("q_id", "rank").collect().toSeq == lit)
  }

  test("zero-norm vectors: corpus rows skipped, probe rows emit nothing") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0)), // 2 = degenerate corpus row
      (3L, Seq(0.6, 0.8)), (4L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    val got = CosineTopK.topK(vecs, "vec_id", "v",
        Seq((1L, Seq(1.0, 0.0)), (9L, Seq(0.0, 0.0))), k = 4,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    // q9 (zero-norm probe) contributes no rows; corpus id 2 never ranks
    assert(got == Seq((1L, 3L), (1L, 4L)), got.toString)
  }

  test("ties break identically to the window: equal cos → smaller id") {
    import spark.implicits._
    // two corpus vectors are EXACT duplicates (ids 20 < 21): both tie
    // on cos, and the operator must rank 20 first like the window's
    // (cos desc, n_id) ordering
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (20L, Seq(0.6, 0.8)), (21L, Seq(0.6, 0.8)),
      (30L, Seq(0.0, 1.0)), (40L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "v")
    val got = CosineTopK.topK(vecs, "vec_id", "v",
        Seq((1L, Seq(1.0, 0.0))), k = 3, excludeSelf = true)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 20L), (2, 21L), (3, 30L)), got.toString)
  }
}
