package graft.graphx

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Louvain one-level synchronous gain rounds: planted-structure
  * recovery, the modularity contract (the fixpoint partition scores at
  * least the singleton partition, i.e. Q > 0 on a clustered graph),
  * the singleton-swap guard (a lone edge MERGES instead of
  * oscillating), determinism, and the rounds metric.
  */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def rounds: Int = spark.sparkContext
    .getLocalProperty("graft.louvain.rounds").toInt

  private def louvain(edges: Seq[(Long, Long)]) =
    GraphAnalytics.louvainOneLevel(edges.toDF("src", "dst"))
      .localCheckpoint()

  test("two triangles with a bridge recover as two communities") {
    // 1-2-3 triangle, 4-5-6 triangle, bridge 3-4 — the textbook case
    val comm = louvain(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
    val parts = comm.groupBy("c")
      .agg(array_sort(collect_list("v")).as("ms"))
      .select("ms").as[Seq[Long]].collect().toSet
    assert(parts == Set(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      s"expected the two triangles, got $parts")
  }

  test("a lone edge merges under the singleton-swap guard") {
    // synchronous gains would swap u and v forever; the guard lets
    // only the larger-label vertex move, so the pair MERGES and the
    // fixpoint lands in round 2 (move, then no-move)
    val comm = louvain(Seq((7L, 9L)))
    val cs = comm.select("v", "c").as[(Long, Long)].collect().toMap
    assert(cs == Map(7L -> 7L, 9L -> 7L), s"expected merge into 7: $cs")
    assert(rounds <= 3, s"lone edge took $rounds rounds")
  }

  test("planted clique-chain fixpoint: clique-pure, positive Q") {
    // the x32 graph shape in miniature: 3 cliques of 5 chained by
    // their min vertices
    val cliques = Seq(10L to 14L, 20L to 24L, 30L to 34L)
    val cliqueEdges = cliques.flatMap(c =>
      for (a <- c; b <- c if a < b) yield (a, b))
    val bridges = Seq((10L, 20L), (20L, 30L))
    val edges = cliqueEdges ++ bridges
    val comm = louvain(edges)
    // every clique ends wholly inside one community
    val byV = comm.select("v", "c").as[(Long, Long)].collect().toMap
    for (c <- cliques)
      assert(c.map(byV).toSet.size == 1, s"clique $c split: ${c.map(byV)}")
    // modularity of the fixpoint is strictly positive (the singleton
    // start scores 0 by definition: e_c = 0 for every singleton)
    val m = edges.size.toDouble
    val labels = byV
    val eIn = edges.count { case (a, b) => labels(a) == labels(b) }
    val degs = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
    val dMass = labels.values.toSeq.distinct.map(c =>
      labels.collect { case (v, cc) if cc == c => degs(v) }.sum)
    val q = eIn / m - dMass.map(d => math.pow(d / (2 * m), 2)).sum
    assert(q > 0.5, s"fixpoint modularity $q not clustered")
  }

  test("partitioning-invariant: 1 vs 8 input partitions agree") {
    // the distributed-determinism contract: every per-round choice is
    // made under a TOTAL order (score desc, label asc), so physical
    // data placement must not leak into the fixpoint
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (6L, 7L), (7L, 8L), (8L, 9L), (9L, 7L))
    val one = GraphAnalytics.louvainOneLevel(
        e.toDF("src", "dst").repartition(1))
      .orderBy("v").collect().toSeq
    val eight = GraphAnalytics.louvainOneLevel(
        e.toDF("src", "dst").repartition(8))
      .orderBy("v").collect().toSeq
    assert(one == eight)
  }

  test("deterministic: two runs produce the identical assignment") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (6L, 7L), (7L, 8L))
    val a = louvain(e).orderBy("v").collect().toSeq
    val b = louvain(e).orderBy("v").collect().toSeq
    assert(a == b)
  }

  test("property: engine rounds == in-memory simulator on random graphs") {
    // an independent in-memory replay of the SAME rules (snapshot
    // gains, exact-integer score, min-label ties, strict improvement,
    // singleton-swap guard, 16-round budget) — any drift between the
    // distributed implementation and its contract fails here on a
    // graph the hand cases didn't think of
    def simulate(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val nbrs = sym.groupBy(_._1).map { case (u, es) =>
        u -> es.map(_._2).toSet }
      val deg = nbrs.map { case (u, ns) => u -> ns.size.toLong }
      val twoM = deg.values.sum
      var c = deg.keys.map(v => v -> v).toMap
      var moved = true
      var r = 0
      while (moved && r < 16) {
        r += 1
        // toSeq first: grouping the KEY SET and mapping through deg
        // would collapse duplicate degree values before summing
        val tot = c.keys.toSeq.groupBy(c).map { case (cc, vs) =>
          cc -> vs.map(deg).sum }
        val size = c.keys.toSeq.groupBy(c)
          .map { case (cc, vs) => cc -> vs.size }
        val next = c.map { case (u, cu) =>
          val k = nbrs(u).toSeq.groupBy(c).map { case (cc, ys) =>
            cc -> ys.size.toLong }
          def score(cc: Long) = twoM * k.getOrElse(cc, 0L) -
            deg(u) * (tot(cc) - (if (cc == cu) deg(u) else 0L))
          val stay = score(cu)
          val cands = k.keys.filter(_ != cu).toSeq
            .sortBy(cc => (-score(cc), cc))
          u -> (cands.headOption match {
            case Some(best) if score(best) > stay &&
              !(size(cu) == 1 && size(best) == 1 && best > cu) => best
            case _ => cu
          })
        }
        moved = next != c
        c = next
      }
      c
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val n = 5 + rnd.nextInt(12)
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = louvain(edges).select("v", "c")
          .as[(Long, Long)].collect().toMap
        val want = simulate(edges)
        assert(got == want, s"trial $trial diverged (n=$n):" +
          s" engine=$got sim=$want edges=$edges")
      }
    }
  }

  test("rounds metric: clique chain converges in a handful of rounds") {
    val cliqueEdges = (for (g <- 0L to 9L) yield {
      val c = (g * 10) to (g * 10 + 9)
      for (a <- c; b <- c if a < b) yield (a, b)
    }).flatten
    val bridges = (0L until 9L).map(g => (g * 10, (g + 1) * 10))
    louvain(cliqueEdges ++ bridges)
    assert(rounds <= 6, s"clique chain took $rounds rounds")
  }
}
