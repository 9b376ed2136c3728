package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the follow loop, mirroring the reference's traversal
  * tests (reference: src/core.tests/Tests.fs:882-900 — a query never
  * yields the same node twice) plus hop-range fixtures the reference
  * lacks (SURVEY.md §7.3 risk 4).
  */
class TraversalSpec extends SparkSpec {
  import spark.implicits._

  // a -> b -> c -> a  (cycle), a -> d, d -> e; labels: x on a->b, rest y
  private lazy val edges = Seq(
    ("a", "x", "b"), ("b", "y", "c"), ("c", "y", "a"),
    ("a", "y", "d"), ("d", "y", "e"))
    .toDF("src_id", "label", "dst_id").withColumn("ts", lit(0L))

  private def ids(label: Option[String], from: Int, to: Int): Set[(String, Int)] =
    Traversal.follow(spark, edges, Seq("a").toDF("id"), label, from, to)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet

  test("cycle terminates and every node appears exactly once") {
    val out = Traversal.follow(spark, edges, Seq("a").toDF("id"), None, 0, 10)
      .collect().map(_.getString(0))
    assert(out.length == out.distinct.length, "node emitted twice")
    assert(out.toSet == Set("a", "b", "c", "d", "e"))
  }

  test("hop is the first-reached distance") {
    assert(ids(None, 0, 10) == Set(("a", 0), ("b", 1), ("d", 1), ("c", 2), ("e", 2)))
  }

  test("range window [from,to] gates emission") {
    assert(ids(None, 2, 2).map(_._1) == Set("c", "e"))
    assert(ids(None, 1, 2).map(_._1) == Set("b", "d", "c", "e"))
  }

  test("labeled follow only walks matching edges") {
    assert(ids(Some("x"), 0, 5).map(_._1) == Set("a", "b"))
  }

  test("root with no outgoing edges yields just the root") {
    val out = Traversal.follow(spark, edges, Seq("e").toDF("id"), None, 0, 3)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("e"))
  }

  test("already-visited node is not re-expanded (cycle back to root)") {
    // a reached again at hop 3 via c->a must not re-emit or re-expand
    assert(ids(None, 3, 3).isEmpty)
  }

  test("hub frontier outgrows the point path; hand-off equals pure distributed") {
    // one hub with 50k out-edges: hop-1 frontier (50k) blows past
    // PointPathMaxFrontier (10k), so the driver loop MUST hand off
    // mid-traversal to the distributed join loop; its output must be
    // identical to running the distributed loop from the start.
    val n = 5 * Traversal.PointPathMaxFrontier
    val hubEdges = spark.range(n.toLong).selectExpr(
        "'hub' as src_id", "'e' as label", "concat('t/', id) as dst_id")
      .unionAll(spark.range(n.toLong).selectExpr(
        "concat('t/', id) as src_id", "'e' as label",
        "concat('u/', id % 7) as dst_id"))
    val viaHandoff = Traversal
      .follow(spark, hubEdges, Seq("hub").toDF("id"), None, 0, 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // shape: hub at hop 0, all 50k targets at hop 1, u/0..u/6 at hop 2
    assert(viaHandoff.size == 1 + n + 7)
    assert(viaHandoff.count(_._2 == 1) == n)
    assert(viaHandoff.filter(_._2 == 2).map(_._1) ==
      (0 until 7).map(i => s"u/$i").toSet)

    val viaDistributed = Traversal.followDistributed(spark, hubEdges,
        Seq(("hub", 0)).toDF("id", "hop"), 0, 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(viaHandoff == viaDistributed,
      "hand-off path diverged from the pure distributed loop")
  }
}
