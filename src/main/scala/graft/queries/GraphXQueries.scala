package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.GraphStore
import graft.graphx.GraphAnalytics

/** Whole-graph analytics queries (SURVEY.md §7.1 M7) on the derived
  * edges view. Connected components is oracle-checkable (components of
  * the customer→nation→region ∪ orders→customer graph are exactly the
  * five region trees); PageRank is fixed-point float — rows-only here,
  * invariants pinned in GraphXSpec.
  */
object GraphXQueries {

  val registry: Seq[RegQuery] = Seq(

    RegQuery("x01_connected_components",
      (s, d) => GraphAnalytics.connectedComponents(GraphStore.edges(s, d))
        .groupBy("component").agg(count(lit(1)).as("cnt"))
        .orderBy("component"),
      Some("""WITH mem AS (
             |  SELECT r_regionkey AS rk, 'region/' || r_regionkey AS id FROM region
             |  UNION ALL SELECT n_regionkey, 'nation/' || n_nationkey FROM nation
             |  UNION ALL SELECT n_regionkey, 'customer/' || c_custkey
             |    FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  UNION ALL SELECT n_regionkey, 'orders/' || o_orderkey
             |    FROM orders JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey)
             |SELECT min(id) AS component, count(*) AS cnt
             |FROM mem GROUP BY rk ORDER BY component""".stripMargin)),

    // fixed 20-iteration integer micro-rank PageRank — deterministic,
    // so the fixpoint loop itself is hash-checked against a DuckDB
    // RECURSIVE CTE running the identical recurrence (the working
    // table of a UNION ALL recursion is exactly "previous iteration")
    RegQuery("x02_pagerank",
      (s, d) => GraphAnalytics.pageRank(GraphStore.edges(s, d), iters = 20)
        .orderBy(col("rank_micro").desc, col("id"))
        .limit(20),
      Some("""WITH RECURSIVE
             |edges AS (
             |  SELECT 'nation/' || n_nationkey AS src,
             |         'region/' || n_regionkey AS dst FROM nation
             |  UNION ALL SELECT 'customer/' || c_custkey,
             |    'nation/' || c_nationkey FROM customer
             |  UNION ALL SELECT 'orders/' || o_orderkey,
             |    'customer/' || o_custkey FROM orders),
             |verts AS (SELECT src AS id FROM edges
             |  UNION SELECT dst FROM edges),
             |od AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
             |ec AS (SELECT e.src, e.dst, od.od FROM edges e
             |    JOIN od ON e.src = od.src
             |  UNION ALL SELECT id, id, 0 FROM verts),
             |pr AS (
             |  SELECT 0 AS i, id, CAST(1000000 AS BIGINT) AS r FROM verts
             |  UNION ALL
             |  SELECT p.i + 1, ec.dst,
             |    CAST(150000 + (85 * sum(
             |      CASE WHEN ec.od > 0 THEN p.r // ec.od ELSE 0 END)) // 100
             |      AS BIGINT)
             |  FROM pr p JOIN ec ON ec.src = p.id
             |  WHERE p.i < 20
             |  GROUP BY p.i, ec.dst)
             |SELECT id, r AS rank_micro FROM pr WHERE i = 20
             |ORDER BY rank_micro DESC, id LIMIT 20""".stripMargin)),

    // directed hop distances TO two landmarks — exercises direction
    // semantics (orders→customer→nation, never the reverse) and
    // reachability filtering; exact, so fully oracle-checked.
    // Dispatched like CC: Pregel under the edge threshold, DataFrame
    // BFS (the scale path) above it — both equality-pinned in GraphXSpec
    RegQuery("x03_shortest_paths",
      (s, d) => GraphAnalytics.shortestPathsAuto(GraphStore.edges(s, d),
          Seq("nation/1", "customer/7"))
        .orderBy("id", "landmark"),
      Some("""SELECT id, landmark, dist FROM (
             |SELECT 'nation/1' AS id, 'nation/1' AS landmark, 0 AS dist
             |UNION ALL SELECT 'customer/' || c_custkey, 'nation/1', 1
             |  FROM customer WHERE c_nationkey = 1
             |UNION ALL SELECT 'orders/' || o_orderkey, 'nation/1', 2
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  WHERE c_nationkey = 1
             |UNION ALL SELECT 'customer/7', 'customer/7', 0
             |UNION ALL SELECT 'orders/' || o_orderkey, 'customer/7', 1
             |  FROM orders WHERE o_custkey = 7
             |) ORDER BY id, landmark""".stripMargin)),

    // triangle counting on the co-purchase graph (parts sharing an
    // order): the one whole-graph statistic here with real triangles
    // (the node/edge view is a forest). Pair list = one equi-join on
    // l_orderkey + distinct; GraphX intersects adjacency sets, and the
    // exact three-way-join mirror in DuckDB checks it to the row
    RegQuery("x04_triangles",
      (s, d) => {
        GraphAnalytics.triangleCounts(coPurchasePairs(s, d))
          // coalesce: a triangle-free pair list sums to NULL while the
          // oracle's count(*) says 0 (latent corner — untriggered on the
          // fixed testdata but a real divergence)
          .agg(expr("coalesce(sum(n_tri), 0) div 3").as("n_tri"),
            count(lit(1)).as("n_in_tri"),
            max(col("n_tri")).cast("long").as("max_tri"))
      },
      Some("""WITH pp AS (SELECT DISTINCT
             |    least(a.l_partkey, b.l_partkey) AS p1,
             |    greatest(a.l_partkey, b.l_partkey) AS p2
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
             |  FROM pp e1 JOIN pp e2 ON e1.p2 = e2.p1
             |  JOIN pp e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
             |pv AS (SELECT v, count(*) AS n FROM (
             |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri) GROUP BY v)
             |SELECT (SELECT count(*) FROM tri) AS n_tri,
             |  (SELECT count(*) FROM pv) AS n_in_tri,
             |  (SELECT max(n) FROM pv) AS max_tri""".stripMargin)),

    // deterministic label-propagation community detection on a graph
    // with PLANTED communities (the docsWithTwins pattern applied to
    // graphs): parts bucket into ~10-member cliques by (brand, partkey
    // rank), cliques chain together through single bridge edges. LPA's
    // majority vote must keep every clique a separate community even
    // though the bridge chain connects them all — exactly what
    // distinguishes it from x01's connected components, which would
    // merge the chain into one blob. Min-label tie-breaking makes the
    // fixpoint a total order, so the whole 5-round recurrence is
    // hash-checked against a DuckDB RECURSIVE CTE (the x02 pattern;
    // arg_max key n*2^32 - lbl = "most frequent, then smallest").
    // Output is the community-size histogram — a global structural
    // check, stronger than a top-k sample.
    RegQuery("x06_label_propagation",
      (s, d) => {
        GraphAnalytics.labelPropagation(brandCliqueChain(s, d), iters = 5)
          .groupBy("lbl").agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("n_comm"))
          .orderBy("sz")
      },
      Some("""WITH RECURSIVE
             |gp AS (SELECT p_partkey AS id, p_brand,
             |    CAST((ROW_NUMBER() OVER (PARTITION BY p_brand
             |      ORDER BY p_partkey) - 1) // 10 AS BIGINT) AS grp
             |  FROM part),
             |cl AS (SELECT a.id AS p1, b.id AS p2 FROM gp a JOIN gp b
             |  ON a.p_brand = b.p_brand AND a.grp = b.grp AND a.id < b.id),
             |gm AS (SELECT p_brand, grp, min(id) AS mid FROM gp
             |  GROUP BY p_brand, grp),
             |br AS (SELECT mid AS p1, lead(mid) OVER (ORDER BY p_brand, grp)
             |  AS p2 FROM gm),
             |edges AS (SELECT p1, p2 FROM cl
             |  UNION ALL SELECT p1, p2 FROM br WHERE p2 IS NOT NULL),
             |ed AS (SELECT p1 AS src, p2 AS dst FROM edges
             |  UNION ALL SELECT p2, p1 FROM edges),
             |verts AS (SELECT DISTINCT src AS id FROM ed),
             |lp AS (
             |  SELECT 0 AS i, id, id AS lbl FROM verts
             |  UNION ALL
             |  SELECT i, src AS id, arg_max(lbl, n * 4294967296 - lbl) AS lbl
             |  FROM (
             |    SELECT l.i + 1 AS i, e.src, l.lbl,
             |      CAST(count(*) AS BIGINT) AS n
             |    FROM lp l JOIN ed e ON e.dst = l.id
             |    WHERE l.i < 5
             |    GROUP BY l.i + 1, e.src, l.lbl)
             |  GROUP BY i, src)
             |SELECT sz, CAST(count(*) AS BIGINT) AS n_comm FROM (
             |  SELECT lbl, CAST(count(*) AS BIGINT) AS sz FROM lp
             |  WHERE i = 5 GROUP BY lbl)
             |GROUP BY sz ORDER BY sz""".stripMargin)),

    // k-core decomposition of the same co-purchase graph: the dense
    // backbone left after iteratively peeling degree<k vertices — the
    // "who actually co-occurs a lot" subgraph community pipelines start
    // from. k=60 sits inside the degree distribution at every SF, so
    // peeling genuinely fires (low-degree parts cascade out) — k=3 was
    // a no-op peel on this dense graph. Oracle-checked since round 4:
    // the peel fixpoint is a DuckDB RECURSIVE CTE whose round is one
    // COUNT() OVER (PARTITION BY endpoint) pair on the single recursive
    // reference (windows in the recursive arm make iterate-to-fixpoint
    // SQL-expressible without a second self-reference), capped at 12
    // rounds: past convergence the edge set is stable so extra rounds
    // are identity, and if real peel depth ever exceeded the cap the
    // hash gate fails loudly instead of silently passing. Core
    // invariants (every member keeps >=k core neighbors, no peeled
    // vertex does) stay pinned in GraphXSpec.
    RegQuery("x05_kcore",
      (s, d) => {
        val core = GraphAnalytics.kCore(coPurchasePairs(s, d), k = 60)
        core.agg(count(lit(1)).as("n_core_vertices"),
          (sum("core_deg") / 2).cast("long").as("n_core_edges"),
          coalesce(min("core_deg"), lit(0L)).as("min_core_deg"),
          coalesce(max("core_deg"), lit(0L)).as("max_core_deg"))
      },
      Some("""WITH RECURSIVE
             |pp AS (SELECT DISTINCT
             |    least(a.l_partkey, b.l_partkey) AS p1,
             |    greatest(a.l_partkey, b.l_partkey) AS p2
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |ed AS (SELECT p1 AS u, p2 AS v FROM pp
             |  UNION ALL SELECT p2, p1 FROM pp),
             |es AS (
             |  SELECT 0 AS i, u, v FROM ed
             |  UNION ALL
             |  SELECT i + 1, u, v FROM (
             |    SELECT e.i, e.u, e.v,
             |      COUNT(*) OVER (PARTITION BY e.u) AS du,
             |      COUNT(*) OVER (PARTITION BY e.v) AS dv
             |    FROM es e WHERE e.i < 12)
             |  WHERE du >= 60 AND dv >= 60),
             |core AS (SELECT u, CAST(count(*) AS BIGINT) AS core_deg
             |  FROM es WHERE i = 12 GROUP BY u)
             |SELECT CAST(count(*) AS BIGINT) AS n_core_vertices,
             |  CAST(coalesce(CAST(sum(core_deg) AS BIGINT), 0)/2 AS BIGINT)
             |    AS n_core_edges,
             |  coalesce(min(core_deg), CAST(0 AS BIGINT)) AS min_core_deg,
             |  coalesce(max(core_deg), CAST(0 AS BIGINT)) AS max_core_deg
             |FROM core""".stripMargin))
  )

  /** Planted-community graph for x06: parts grouped into ~10-member
    * cliques by (brand, partkey-rank div 10) — the clique pair fan-out
    * is the bounded in-row explode from coPurchasePairs — plus one
    * bridge edge from each clique's min vertex to the next clique's
    * (brand, grp order), chaining every community together. The bridge
    * builder's global lead() window runs over one row per CLIQUE
    * (|parts|/10 — pre-aggregated, the p27 bounded-window shape), not
    * per vertex. */
  private def brandCliqueChain(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gp = graft.Tables(s, d, "part")
      .select(col("p_partkey").cast("long").as("id"), col("p_brand"))
      .withColumn("grp", floor((row_number().over(
        Window.partitionBy("p_brand").orderBy("id")) - 1) / 10).cast("long"))
    val cl = gp.groupBy("p_brand", "grp")
      .agg(array_sort(collect_set(col("id"))).as("ps"))
      .select(col("p_brand"), col("grp"), col("ps"))
    val cliquePairs = cl
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("p1"), b.as("p2")))))).as("e"))
      .select(col("e.p1"), col("e.p2"))
    val bridges = cl
      .select(col("p_brand"), col("grp"), element_at(col("ps"), 1).as("mid"))
      .withColumn("p2", lead(col("mid"), 1).over(
        Window.orderBy("p_brand", "grp")))
      .where(col("p2").isNotNull)
      .select(col("mid").as("p1"), col("p2"))
    cliquePairs.unionAll(bridges)
  }

  /** Co-purchase pair list (parts sharing an order, p1 < p2): one
    * shuffle on l_orderkey + in-row fan-out (orders hold ≤7 parts) —
    * the same bounded-bucket explode as LSH candidatePairs, never a
    * self-join. Shared by x04 and x05. */
  private def coPurchasePairs(s: org.apache.spark.sql.SparkSession,
                              d: String): org.apache.spark.sql.DataFrame =
    graft.Tables(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), b =>
          struct(a.as("p1"), b.as("p2")))))).as("e"))
      .select(col("e.p1").cast("long").as("p1"),
        col("e.p2").cast("long").as("p2"))
      .distinct()
}
